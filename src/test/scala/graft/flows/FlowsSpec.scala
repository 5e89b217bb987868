package graft.flows

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.LlmTransform

case class Paciente(cpf: String, nome: String, nome_social: String,
    data_nascimento: String)
case class Estab(id_cnes: String, nome: String)
case class Pront(id_prontuario_local: String, fornecedor: String)
case class Cid(id: String, descricao: String)
case class Episodio(paciente: Paciente, entrada_datahora: String,
    saida_datahora: String, estabelecimento: Estab, prontuario: Pront,
    cid: Cid, data_particao: String)

class InformesSegurancaSpec extends SparkSpec {
  import spark.implicits._

  private val groups = Seq(
    InformesSeguranca.CidGroup("X85", "Y09", "Agressões"),
    InformesSeguranca.CidGroup("Y85", "Y89", "Sequelas"))

  private def episodes = Seq(
    Episodio(Paciente("1", "Ana", null, "1990-01-01"), "08:00", "09:00",
      Estab("c1", "UPA"), Pront("p1", "vitai"), Cid("X95", "Agressão arma"), "2026-08-11"),
    Episodio(Paciente("2", "Bia", "Bia S", "1991-01-01"), "08:30", null,
      Estab("c2", "Hosp"), Pront("p2", "vitacare"), Cid("Y891", "Sequela"), "2026-08-11"),
    Episodio(Paciente("3", null, null, "1992-01-01"), "09:00", null,
      Estab("c1", "UPA"), Pront("p3", "vitai"), Cid("Z99", "Outro"), "2026-08-11"),
    Episodio(Paciente("4", "Caio", null, "1993-01-01"), "10:00", null,
      Estab("c3", "CMS"), Pront("p4", "vitai"), Cid("X86", "Agressão"), "2026-08-12")
  ).toDF()

  test("day slice projects nested fields and prunes other partitions") {
    val day = InformesSeguranca.episodesForDate(episodes, "2026-08-11")
    assert(day.count() == 3)
    assert(day.columns.toSeq.take(4) == Seq("cpf", "nome", "nome_social", "data_nascimento"))
  }

  test("CID band groups match with the high-sentinel inclusive end") {
    val classified = InformesSeguranca.withCidGroup(
      InformesSeguranca.episodesForDate(episodes, "2026-08-11"), groups)
    val byCid = classified.select("cid", "grupo").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byCid("X95") == "X85–Y09")
    assert(byCid("Y891") == "Y85–Y89") // Y891 > Y89 but ≤ Y89￿ — sentinel case
    assert(byCid("Z99") == "?")        // unmatched → reference fallback
  }

  test("report rolls up counts and distinct patients per group") {
    val rep = InformesSeguranca.run(episodes, "2026-08-11", groups).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(rep == Seq(("?", 1L, 1L), ("X85–Y09", 1L, 1L), ("Y85–Y89", 1L, 1L)))
  }

  test("patientDisplay covers the three reference presentation cases") {
    val df = Seq(("1", null, null), ("2", "Ana", null), ("3", "Bia", "Bia S"))
      .toDF("cpf", "nome", "nome_social")
      .select(InformesSeguranca.patientDisplay(
        col("cpf"), col("nome"), col("nome_social")).as("d"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("CPF 1", "Ana (CPF 2)", "Bia S (Bia; CPF 3)"))
  }
}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val stamp = Ingest.RunStamp("run-1", Timestamp.valueOf("2026-08-12 03:00:00"))

  test("landByLoadDate conforms, strings, stamps, partitions; empty skips") {
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString + "/t"
    val src = Seq((1, "Ação", 2.5)).toDF("Id Médico", "Nome Ação", "Valor $")
    assert(Ingest.landByLoadDate(src, stamp, dir))
    val back = spark.read.parquet(dir)
    assert(back.columns.toSet == Set("id_medico", "nome_acao", "valor",
      "run_id", "loaded_at", "ano_particao", "mes_particao", "data_particao"))
    // partition discovery may re-infer the dir value as DATE — compare as string
    assert(back.select(col("data_particao").cast("string")).head.getString(0) == "2026-08-12")
    // payload columns landed as strings
    assert(back.schema("valor").dataType.typeName == "string")
    // empty source writes nothing
    assert(!Ingest.landByLoadDate(src.filter(lit(false)), stamp, dir + "2"))
  }

  test("scrollAll drains pages, retries a flaky page on the SAME cursor, caps runaways") {
    // 3 pages of a fake scroll API; page "p2" fails once before succeeding
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    def fetch(cursor: Option[String]): (Seq[Int], Option[String]) = cursor match {
      case None       => (Seq(1, 2), Some("p2"))
      case Some("p2") =>
        if (!failedOnce.getAndSet(true)) throw new RuntimeException("transient")
        (Seq(3), Some("p3"))
      case Some("p3") => (Seq(4, 5), None)
      case other      => fail(s"unexpected cursor $other")
    }
    val (rows, pages) = Ingest.scrollAll(fetch _)
    assert(rows == Seq(1, 2, 3, 4, 5) && pages == 3)
    // permanent failure surfaces with the page context
    val boom = intercept[java.io.IOException](
      Ingest.scrollAll[Int](_ => throw new RuntimeException("down"), maxRetries = 2))
    assert(boom.getMessage.contains("after 2 retries"))
    // runaway cursor (never-None) hits the page cap loudly
    intercept[IllegalArgumentException](
      Ingest.scrollAll[Int](_ => (Seq(1), Some("again")), maxPages = 10))
  }

  test("scrollAll: a forward-only cursor fails loudly instead of retrying") {
    // retrySafe = _.isEmpty (the ES-scroll shape): the initial search may
    // retry, but a failed SCROLL page must not be re-sent — the server
    // already advanced the context, a re-send would skip a batch
    val initialFailed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def fetch(cursor: Option[String]): (Seq[Int], Option[String]) = cursor match {
      case None =>
        if (!initialFailed.getAndSet(true)) throw new RuntimeException("transient")
        (Seq(1), Some("s1"))
      case Some("s1") => throw new RuntimeException("connection reset")
      case other      => fail(s"unexpected cursor $other")
    }
    val boom = intercept[java.io.IOException](
      Ingest.scrollAll(fetch _, retrySafe = _.isEmpty))
    assert(boom.getMessage.contains("forward-only"))
    assert(initialFailed.get) // the initial search DID retry
  }

  test("landJsonPayload packs payload to a JSON column beside metadata") {
    val dir = java.nio.file.Files.createTempDirectory("ingestj").toString + "/t"
    val src = Seq((10, "x"), (20, "y")).toDF("valor", "tipo")
    Ingest.landJsonPayload(src, Seq("valor", "tipo"),
      Map("_source_cnes" -> lit("123")), "2026-08-11", stamp, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(back.columns.contains("data") && back.columns.contains("_source_cnes"))
    val parsed = back.select(get_json_object(col("data"), "$.valor").cast("int").as("v"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(parsed == Seq(10, 20))
  }
}

class LlmTransformSpec extends SparkSpec {
  import spark.implicits._

  test("classify retries failures and paces per partition; parse extracts verdicts") {
    val df = Seq((1L, "texto a"), (2L, "texto b")).toDF("id", "text")
    // deterministic stub: fails on first attempt for id-like texts ending 'a'
    val stub: String => String = s =>
      if (s.endsWith("a") && !LlmStubState.seen.getAndSet(true)) throw new RuntimeException("flaky")
      else s"Resposta: SIM (90%) para [$s]"
    val out = LlmTransform.classify(df, "id", "text", stub, maxRetries = 3)
    val parsed = LlmTransform.parseVerdict(out.toDF(), "raw")
      .select("id", "label", "confidence", "attempts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).sortBy(_._1)
    assert(parsed.forall(p => p._2 == "sim" && p._3 == 0.9))
    assert(parsed.exists(_._4 > 1)) // the flaky row was retried
  }
}

/** Executor-side singleton so the stub's "fail once" state survives
  * serialization of the closure.
  */
object LlmStubState {
  val seen = new java.util.concurrent.atomic.AtomicBoolean(false)
}
