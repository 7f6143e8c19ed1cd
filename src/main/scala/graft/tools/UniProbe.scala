package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: engine-side Unicode semantics vs the DuckDB oracle
  * (word-class rlike, per-code-point regexp_replace split, translate
  * with multibyte targets, lower on accented/Cyrillic/CJK). */
object UniProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq("·", "café", "añо1", "数据", "ab-c", "Ⅻ", "x²",
      "CAFÉ Дом ЖЖ 数据 Über", "value data").toDF("w")
    df.select(col("w"),
        col("w").rlike("^[\\p{L}\\p{N}]+$").as("is_word"),
        regexp_replace(col("w"), "(.)", "·$1·").as("split"),
        lower(col("w")).as("lo"),
        translate(col("w"), "aeiou", "àéïöü").as("tr"))
      .collect().foreach { r =>
        println(s"W=[${r.getString(0)}] word=${r.getBoolean(1)} " +
          s"split=[${r.getString(2)}] lo=[${r.getString(3)}] " +
          s"tr=[${r.getString(4)}]")
      }
    // Character-class parity: regex \p{L}\p{N} vs the code-point check
    val cats = Set(Character.DECIMAL_DIGIT_NUMBER, Character.LETTER_NUMBER,
      Character.OTHER_NUMBER).map(_.toInt)
    def isWordCp(s: String): Boolean = {
      if (s.isEmpty) return false
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        if (!Character.isLetter(cp) && !cats(Character.getType(cp)))
          return false
        i += Character.charCount(cp)
      }
      true
    }
    val pat = java.util.regex.Pattern.compile("^[\\p{L}\\p{N}]+$")
    var mismatches = 0
    (0 until 0x2FFF).foreach { cp =>
      val s = new String(Character.toChars(cp))
      if (pat.matcher(s).matches() != isWordCp(s)) {
        mismatches += 1
        if (mismatches < 10) println(f"MISMATCH U+$cp%04X")
      }
    }
    println(s"codepoint-class mismatches 0..0x2FFF: $mismatches")
    spark.stop()
  }
}
