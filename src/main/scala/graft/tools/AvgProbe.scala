package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.math.{BigDecimal => JBD, RoundingMode, MathContext}

object AvgProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for ((p, s) <- Seq((12, 2), (21, 4), (38, 10))) {
      val rnd = new scala.util.Random(42 + p)
      val rows = (1 to 400).map { i =>
        (i.toLong, (rnd.nextInt(2000000) - 1000000) / 100.0) }
      val df = rows.toDF("id", "x").withColumn("d", col("x").cast(s"decimal($p,$s)"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("id")).rowsBetween(Long.MinValue, 0)
      val got = df.withColumn("a", avg(col("d")).over(w))
        .select("id", "a").collect()
        .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      // candidates
      val resP = math.min(p + 4, 38); val resS = math.min(s + 4, 38)
      val sumP = math.min(p + 10, 38)
      val (divP, divS) = {
        val intDig = sumP - s
        val scale0 = math.max(6, s + 21)
        val prec0 = intDig + scale0
        if (prec0 <= 38) (prec0, scale0)
        else (38, math.max(38 - intDig, math.min(scale0, 6)))
      }
      var sum = JBD.ZERO
      var c2wrong = 0; var c1wrong = 0; var c3wrong = 0
      var ex1 = ""; var ex2 = ""; var ex3 = ""
      rows.zipWithIndex.foreach { case ((id, x), idx) =>
        val d = new JBD(x).setScale(s, RoundingMode.HALF_UP)
        sum = sum.add(d)
        val cnt = JBD.valueOf(idx + 1L)
        // c1: divide scale 38 HALF_UP, round divS, round resS
        val q1a = sum.divide(cnt, 38, RoundingMode.HALF_UP)
        val q1 = q1a.setScale(divS, RoundingMode.HALF_UP).setScale(resS, RoundingMode.HALF_UP)
        // c2: divide scale 38 then straight to resS
        val q2 = sum.divide(cnt, 38, RoundingMode.HALF_UP).setScale(resS, RoundingMode.HALF_UP)
        // c3: MathContext(38) sig digits then resS
        val q3 = sum.divide(cnt, new MathContext(38, RoundingMode.HALF_UP)).setScale(resS, RoundingMode.HALF_UP)
        val g = got(id)
        if (g.compareTo(q1) != 0) { c1wrong += 1; if (ex1.isEmpty) ex1 = s"id=$id got=$g q1=$q1" }
        if (g.compareTo(q2) != 0) { c2wrong += 1; if (ex2.isEmpty) ex2 = s"id=$id got=$g q2=$q2" }
        if (g.compareTo(q3) != 0) { c3wrong += 1; if (ex3.isEmpty) ex3 = s"id=$id got=$g q3=$q3" }
      }
      println(s"decimal($p,$s): divT=($divP,$divS) res=($resP,$resS) " +
        s"c1(two-step)=$c1wrong c2(scale38)=$c2wrong c3(mc38)=$c3wrong")
      if (ex1.nonEmpty) println("  ex1: " + ex1)
      if (ex2.nonEmpty) println("  ex2: " + ex2)
      if (ex3.nonEmpty) println("  ex3: " + ex3)
    }
    spark.stop()
  }
}
