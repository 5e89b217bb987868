package graft.flows

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The reference's clearest end-to-end report query (SURVEY §7.2 minimum
  * slice): daily security-incident episodes — partition-pruned scan of a
  * nested episode table, projection of patient/establishment/record fields,
  * presentation ordering, CID band-group classification, and per-group
  * rollups (reference: pipelines/reports/informes_seguranca/tasks.py:32-55
  * and utils.py:60-95).
  */
object InformesSeguranca {

  final case class CidGroup(start: String, end: String, descricao: String)

  /** Partition-pruned day slice with the reference's exact projection and
    * presentation order (`cid asc, coalesce(nome_social, nome) asc nulls
    * last`). The `data_particao = date` predicate prunes to one partition
    * directory on a lake table.
    */
  def episodesForDate(episodes: DataFrame, date: String): DataFrame =
    episodes.filter(col("data_particao") === date)
      .select(
        col("paciente.cpf").as("cpf"),
        col("paciente.nome").as("nome"),
        col("paciente.nome_social").as("nome_social"),
        col("paciente.data_nascimento").as("data_nascimento"),
        col("entrada_datahora").as("entrada"),
        col("saida_datahora").as("saida"),
        col("estabelecimento.id_cnes").as("cnes"),
        col("estabelecimento.nome").as("estabelecimento"),
        col("prontuario.id_prontuario_local").as("id_prontuario"),
        col("prontuario.fornecedor").as("fornecedor"),
        col("cid.id").as("cid"),
        col("cid.descricao").as("cid_descricao"))
      .orderBy(col("cid").asc,
        coalesce(col("nome_social"), col("nome")).asc_nulls_last)

  /** CID → group classification: the reference walks a group table checking
    * `cid >= start && cid <= end + "￿"` (the high sentinel makes the
    * inclusive end cover prefixed codes, e.g. Y891 ∈ Y85–Y89;
    * reference: informes_seguranca/utils.py:71-82). Here that loop is a
    * broadcast band join; unmatched codes get the reference's
    * ("?", "Grupo desconhecido") fallback.
    */
  def withCidGroup(episodes: DataFrame, groups: Seq[CidGroup]): DataFrame = {
    val spark = episodes.sparkSession
    import spark.implicits._
    val ranges = groups
      .map(g => (s"${g.start}–${g.end}", g.start, g.end + "￿", g.descricao))
      .toDF("grupo", "g_start", "g_end", "grupo_descricao")
    Relational.bandJoin(episodes, ranges, col("cid"), "g_start", "g_end", "left")
      .withColumn("grupo", coalesce(col("grupo"), lit("?")))
      .withColumn("grupo_descricao",
        coalesce(col("grupo_descricao"), lit("Grupo desconhecido")))
      .drop("g_start", "g_end")
  }

  /** Patient display name, exactly the reference's three presentation cases
    * (utils.py:60-69): CPF only, name (CPF), or social name (name; CPF).
    */
  def patientDisplay(cpf: org.apache.spark.sql.Column,
      nome: org.apache.spark.sql.Column,
      nomeSocial: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nome.isNull && nomeSocial.isNull, concat(lit("CPF "), cpf))
      .when(nomeSocial.isNull, concat(nome, lit(" (CPF "), cpf, lit(")")))
      .otherwise(concat(nomeSocial, lit(" ("), nome, lit("; CPF "), cpf, lit(")")))

  /** Per-group rollup: episode count, distinct patients, establishments. */
  def report(classified: DataFrame): DataFrame =
    classified.groupBy(col("grupo"), col("grupo_descricao"))
      .agg(count(lit(1)).as("n_episodios"),
        countDistinct(col("cpf")).as("n_pacientes"),
        countDistinct(col("cnes")).as("n_estabelecimentos"))
      .orderBy(col("grupo"))

  /** Full slice: day filter → projection → classification → rollup. */
  def run(episodes: DataFrame, date: String, groups: Seq[CidGroup]): DataFrame =
    report(withCidGroup(episodesForDate(episodes, date), groups))
}
