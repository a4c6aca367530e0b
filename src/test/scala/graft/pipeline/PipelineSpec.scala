package graft.pipeline

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession
import graft.quality.ValidationFailure

/** End-to-end pipeline test with planted defects (SURVEY §5.2.2,
  * FIXTURES.md §A): the transform must drop exactly the malformed rows and
  * validation must flag exactly the planted defects. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark

  private def write(path: String, content: String): String = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    path
  }

  // Planted defects (FIXTURES.md A1): bad date, bad units, duplicate
  // (product_id, date) key, orphan product, negative amount.
  private lazy val salesCsv = write("target/fixtures/store_sales.csv",
    """dt,store,product,units,amount
      |2024-01-05,S01,P001,3,29.97
      |2024-01-05,S01,P002,1,9.99
      |bad-date,S01,P001,2,19.98
      |2024-01-06,S02,P001,xx,10.00
      |2024-01-07,S02,P002,2,19.98
      |2024-01-07,S02,P002,5,-5.00
      |2024-01-08,S03,P999,1,5.00
      |""".stripMargin)

  // Planted defects (FIXTURES.md A2): exact duplicate record, null name,
  // zero price.
  private lazy val productsJson = write("target/fixtures/products.json",
    """[
      |  {"product_id": "P001", "product_name": "Widget", "price": 9.99},
      |  {"product_id": "P002", "product_name": "Gadget", "price": 19.99},
      |  {"product_id": "P002", "product_name": "Gadget", "price": 19.99},
      |  {"product_id": "P003", "product_name": "Free",   "price": 0.0},
      |  {"product_id": "P004", "product_name": null,     "price": 5.0}
      |]""".stripMargin)

  test("E2E: transform drops exactly the malformed rows") {
    val sales = Pipeline.transformSales(graft.sources.Sources.csv(spark, salesCsv))
    // 7 rows - bad date - bad units = 5
    assert(sales.count() == 5)
    val products = Pipeline.transformProducts(graft.sources.Sources.json(spark, productsJson))
    // 5 records - 1 exact duplicate - 1 null name = 3
    assert(products.count() == 3)
  }

  test("E2E: validation flags exactly the planted defects") {
    val e = intercept[ValidationFailure] {
      Pipeline.run(spark, salesCsv, productsJson, database = "test_e2e")
    }
    val failed = e.results.map(r => s"${r.table}/${r.check}").toSet
    assert(failed == Set(
      "store_sales/no_duplicate_keys",    // (P002, 2024-01-07) ×2
      "store_sales/referential_integrity", // P999 orphan
      "store_sales/range_sales_amount",    // -5.00
      "products/range_price"))             // price 0.0 (strict > 0)
  }

  test("E2E: clean inputs validate green and report renders") {
    val cleanSales = write("target/fixtures/clean_sales.csv",
      """dt,store,product,units,amount
        |2024-01-05,S01,P001,3,29.97
        |2024-01-06,S01,P002,1,9.99
        |""".stripMargin)
    val cleanProducts = write("target/fixtures/clean_products.json",
      """[
        |  {"product_id": "P001", "product_name": "Widget", "price": 9.99},
        |  {"product_id": "P002", "product_name": "Gadget", "price": 19.99}
        |]""".stripMargin)
    val results = Pipeline.run(spark, cleanSales, cleanProducts, database = "test_clean")
    assert(results.forall(_.passed))
    val report = graft.quality.Checks.renderReport(results)
    assert(report.contains("failed=0"))
    // loaded tables are readable back from the warehouse by name (S4/K2)
    assert(spark.table("test_clean.store_sales").count() == 2)
  }

  test("O3: retry combinator retries then succeeds") {
    var attempts = 0
    val out = Pipeline.retry(3) { attempts += 1; if (attempts < 3) sys.error("flaky") else 42 }
    assert(out == 42 && attempts == 3)
    intercept[RuntimeException](Pipeline.retry(2)(sys.error("always")))
  }

  test("O3: retry does NOT swallow fatal errors (NonFatal only)") {
    var attempts = 0
    intercept[InterruptedException] {
      Pipeline.retry(3) { attempts += 1; throw new InterruptedException("stop") }
    }
    Thread.interrupted() // clear the flag for later tests
    assert(attempts == 1, "a fatal error must not be retried")
  }
}
