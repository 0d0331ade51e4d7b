package graft.model

/** dbt 1.8 unit tests: run ONE model's logic against inline fixture
  * inputs and compare to an expected fixture — logic testing (the CASE
  * expression, the join shape, the regex) as opposed to data tests,
  * which validate real relations after a run. Fixtures use dbt's CSV
  * fixture format: a header row then data rows, types inferred.
  *
  * `givenCsv` keys address the model's inputs the way the model refs
  * them: a ref by model name, a source as "sourceName.table". Every
  * input of the model MUST be mocked — a unit test that silently read
  * production data would be a data test with extra steps.
  */
final case class UnitTest(
    name: String,
    model: String,
    givenCsv: Map[String, String],
    expectCsv: String) {
  require(name.nonEmpty && model.nonEmpty, "unit test needs name and model")
  require(expectCsv.trim.nonEmpty, "unit test needs an expect fixture")
}
