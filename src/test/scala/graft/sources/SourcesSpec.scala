package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class FixedWidthReaderSpec extends SparkSpec {
  test("dictionary derives cumulative 1-based offsets") {
    assert(FixedWidthReader.dictionary(Seq("a" -> 3, "b" -> 5, "c" -> 2)) ==
      Seq(FixedWidthReader.Field("a", 1, 3), FixedWidthReader.Field("b", 4, 5),
        FixedWidthReader.Field("c", 9, 2)))
  }
  test("read slices fixed-width lines into trimmed string columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fw").toString
    Seq("001alpha     X", "002beta      Y").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val fields = FixedWidthReader.dictionary(Seq("id" -> 3, "name" -> 10, "flag" -> 1))
    val r = FixedWidthReader.read(spark, dir, fields)
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2))).sorted.toSeq
    assert(r == Seq(("001", "alpha", "X"), ("002", "beta", "Y")))
  }
}

class CsvReaderSpec extends SparkSpec {
  test("reads with explicit separator and conforms headers") {
    val dir = Files.createTempDirectory("csv").toString
    Files.writeString(java.nio.file.Path.of(dir, "t.csv"),
      "Nome Ação;Valor Total\nabc;10\ndef;20\n")
    val df = CsvReader.read(spark, s"$dir/t.csv", CsvReader.Options(sep = ";"))
    assert(df.columns.toSeq == Seq("nome_acao", "valor_total"))
    assert(df.count() == 2)
  }
  test("sniffSep detects semicolon vs comma") {
    val dir = Files.createTempDirectory("csv2").toString
    Files.writeString(java.nio.file.Path.of(dir, "t.csv"), "a;b;c\n1;2;3\n")
    assert(CsvReader.sniffSep(spark, s"$dir/t.csv") == ";")
  }

  test("isValidUtf8: ascii, multibyte, truncation tolerance, cp1252 rejection") {
    def v(bs: Array[Byte], ts: Boolean = false) = CsvReader.isValidUtf8(bs, ts)
    assert(v("hello".getBytes("UTF-8")))
    assert(v("ação é çãâ".getBytes("UTF-8")))
    assert(v("� legit replacement".getBytes("UTF-8"))) // U+FFFD itself is valid UTF-8
    assert(!v("ação".getBytes("windows-1252")))             // 0xE7/0xE3 lead bytes invalid
    assert(!v(Array(0xC0.toByte, 0xAF.toByte)))             // overlong
    assert(!v(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte))) // surrogate
    val eur = "€x".getBytes("UTF-8")                         // E2 82 AC 78
    assert(v(eur.take(2)))                                   // truncated tail char ok
    assert(v(eur.drop(1), ts = true))                        // orphan continuations at start ok
    assert(!v(eur.drop(1), ts = false))
  }

  test("encoding fallback: cp1252 file detected via bounded sniff") {
    val dir = Files.createTempDirectory("csvenc").toString
    val text = "nome;valor\njoão ação;10\ncoração;20\n"
    Files.write(java.nio.file.Path.of(dir, "t.csv"), text.getBytes("windows-1252"))
    val df = CsvReader.readWithEncodingFallback(spark, s"$dir/t.csv",
      CsvReader.Options(sep = ";"))
    val names = df.collect().map(_.getString(0)).sorted.toSeq
    assert(names == Seq("coração", "joão ação"))
  }

  test("encoding fallback: valid UTF-8 containing a literal U+FFFD stays UTF-8") {
    val dir = Files.createTempDirectory("csvenc2").toString
    val text = "nome;valor\nbad�char açaí;10\n"
    Files.write(java.nio.file.Path.of(dir, "t.csv"), text.getBytes("UTF-8"))
    val df = CsvReader.readWithEncodingFallback(spark, s"$dir/t.csv",
      CsvReader.Options(sep = ";"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("bad�char açaí"))
    val full = CsvReader.readWithEncodingFallback(spark, s"$dir/t.csv",
      CsvReader.Options(sep = ";"), fullScan = true)
    // fullScan compares replacement counts both ways; UTF-8 decode (1 legit
    // U+FFFD) beats cp1252 mojibake (which garbles açaí and keeps the U+FFFD
    // bytes as three cp1252 chars) — file must NOT flip
    assert(full.collect().map(_.getString(0)).toSeq == Seq("bad�char açaí"))
  }

  test("encoding fallback: late non-ASCII caught by the tail sample") {
    val dir = Files.createTempDirectory("csvenc3").toString
    val sb = new StringBuilder("nome;valor\n")
    (1 to 200000).foreach(i => sb.append(s"plain_ascii_row_$i;$i\n"))
    sb.append("coração final;0\n")
    Files.write(java.nio.file.Path.of(dir, "t.csv"),
      sb.toString.getBytes("windows-1252"))
    val df = CsvReader.readWithEncodingFallback(spark, s"$dir/t.csv",
      CsvReader.Options(sep = ";"))
    assert(df.filter(col("nome") === "coração final").count() == 1)
  }
}

class LakeWriterSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write + dynamic partition overwrite is idempotent") {
    val dir = Files.createTempDirectory("lake").toString + "/tbl"
    val day1 = Seq((1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00"))
      .toDF("id", "ts").withColumn("ts", to_timestamp(col("ts")))
    val day2 = Seq((3, "2024-01-02 10:00:00")).toDF("id", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    LakeWriter.overwritePartitions(LakeWriter.withDatePartitions(day1, col("ts")), dir)
    LakeWriter.overwritePartitions(LakeWriter.withDatePartitions(day2, col("ts")), dir)
    // re-write day1: replaces ONLY that partition, day2 stays
    LakeWriter.overwritePartitions(LakeWriter.withDatePartitions(day1, col("ts")), dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(back.select("data_particao").distinct().count() == 2)
  }

  test("audit columns + all-string landing cast") {
    val df = Seq((1, 2.5)).toDF("id", "v")
    val stamped = LakeWriter.withAudit(df, "run-1",
      java.sql.Timestamp.valueOf("2026-08-12 00:00:00"))
    assert(stamped.columns.contains("run_id") && stamped.columns.contains("loaded_at"))
    val strings = LakeWriter.allString(stamped)
    assert(strings.schema.fields.forall(_.dataType.typeName == "string"))
  }
}

class FileListingSpec extends SparkSpec {
  test("newestFilePerKey keeps the max version per extracted key") {
    import java.nio.file.{Files, Path}
    val dir = Files.createTempDirectory("listing")
    Seq("unit-111-sql-20240101.bak", "unit-111-sql-20240301.bak",
      "unit-222-sql-20240201.bak").foreach(n => Files.writeString(dir.resolve(n), "x"))
    val files = Lake.listFiles(spark, dir.toString)
    assert(files.count() == 3)
    val newest = Lake.newestFilePerKey(files,
      keyRegex = "unit-(\\d+)-sql", versionRegex = "sql-(\\d+)\\.bak")
    val byKey = newest.collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("version"))).toMap
    assert(byKey == Map("111" -> "20240301", "222" -> "20240201"))
  }
}

class PartitionPruningSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("data_particao filter prunes partition directories at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("prune").toString + "/t"
    val rows = Seq((1, "2024-01-01 10:00:00"), (2, "2024-01-02 10:00:00"),
      (3, "2024-01-03 10:00:00")).toDF("id", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    LakeWriter.overwritePartitions(LakeWriter.withDatePartitions(rows, col("ts")), dir)
    val pruned = spark.read.parquet(dir).filter(col("data_particao") === "2024-01-02")
    assert(pruned.count() == 1)
    val plan = pruned.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse(plan)
    assert(scanLine.contains("data_particao"), scanLine)
  }
}
