package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.api.VfsApi

/** The reference's end-to-end suite (tests.sh, 8 sequential cases with
  * expected status codes) translated 1:1 to library calls. */
class VfsApiSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark
  lazy val api = new VfsApi(spark,
    Files.createTempDirectory("vfs-api").toString)

  test("1. init storage -> 200 (tests.sh:73-78)") {
    val r = api.init("""{"vector_dimension": 4, "quantize": false}""")
    assert(r.status === 200, r.bodyString)
  }

  test("2. insert valid vector -> 201 (tests.sh:81-85)") {
    val r = api.register(
      """{"values": [0.1, 0.2, 0.3, 0.4], "name": "test_vector",
        |"tags": ["test"]}""".stripMargin)
    assert(r.status === 201, r.bodyString)
    assert(r.body.path("id").asLong() === 1L)
    assert(r.body.path("status").asText() === "success")
  }

  test("3. insert wrong-dimension vector -> 400 (tests.sh:88-92)") {
    val r = api.register("""{"values": [0.1, 0.2], "name": "bad", "tags": []}""")
    assert(r.status === 400, r.bodyString)
  }

  test("4. get vector by id=1 -> 200 (tests.sh:95)") {
    val r = api.getVector(1L)
    assert(r.status === 200, r.bodyString)
    assert(r.body.path("name").asText() === "test_vector")
    assert(r.body.path("values").size() === 4)
    // F4 projection: no created_at / scale_factor in the response
    assert(!r.body.has("created_at") && !r.body.has("scale_factor"))
  }

  test("5. approximate search -> 200 (tests.sh:98-104)") {
    (2 to 12).foreach { i =>
      api.register(s"""{"values": [0.1, 0.2, ${i / 10.0}, 0.4],
        |"name": "v$i", "tags": []}""".stripMargin)
    }
    val r = api.search(
      """{"values": [0.1, 0.2, 0.3, 0.4], "top_k": 3,
        |"search_type": "approximate", "distance_method": "cosine",
        |"ef_search": 6}""".stripMargin)
    assert(r.status === 200, r.bodyString)
    val results = r.body.path("results")
    assert(results.size() === 3, r.bodyString) // documented top-k semantics
    assert(results.get(0).path("id").asLong() === 1L) // exact match first
    assert(r.body.path("query_time_ms").asDouble() > 0)
  }

  test("6. flush -> 200 (tests.sh:107)") {
    assert(api.flush().status === 200)
  }

  test("7. snapshot -> 200 (tests.sh:110)") {
    assert(api.snapshot().status === 200)
  }

  test("8. restore -> 200 (tests.sh:113)") {
    assert(api.restore().status === 200)
    // state survives: the snapshot saw all 12 vectors
    val r = api.getVector(12L)
    assert(r.status === 200)
  }

  test("exact search with simd alias metric matches scalar metric") {
    val a = api.search(
      """{"values": [0.1, 0.2, 0.3, 0.4], "top_k": 3,
        |"search_type": "exact", "distance_method": "euclidean"}""".stripMargin)
    val b = api.search(
      """{"values": [0.1, 0.2, 0.3, 0.4], "top_k": 3,
        |"search_type": "exact", "distance_method": "simd_euclidean"}""".stripMargin)
    assert(a.status === 200 && b.status === 200)
    assert(a.body.path("results").toString ===
      b.body.path("results").toString)
  }

  test("tag-filtered exact search restricts candidates") {
    val r = api.search(
      """{"values": [0.1, 0.2, 0.3, 0.4], "top_k": 10,
        |"search_type": "exact", "filter_tags": ["test"]}""".stripMargin)
    assert(r.status === 200, r.bodyString)
    // only vector id=1 carries the "test" tag (inserted in case 2)
    assert(r.body.path("results").size() === 1, r.bodyString)
    assert(r.body.path("results").get(0).path("id").asLong() === 1L)
  }

  test("re-init with truncate_data=false keeps existing data and ids") {
    val root = Files.createTempDirectory("vfs-reinit").toString
    val a1 = new VfsApi(spark, root)
    a1.init("""{"vector_dimension": 2}""")
    a1.register("""{"values": [1.0, 2.0], "name": "keep", "tags": []}""")
    a1.flush()
    // fresh handle, keep-data init (the reference's ResetOptions mode)
    val a2 = new VfsApi(spark, root)
    val r = a2.init("""{"vector_dimension": 2, "truncate_data": false}""")
    assert(r.status === 200, r.bodyString)
    assert(a2.getVector(1L).status === 200)
    val ins = a2.register("""{"values": [3.0, 4.0], "name": "new", "tags": []}""")
    assert(ins.body.path("id").asLong() === 2L) // ids continue, not reset
    // dimension conflict without truncate is rejected
    assert(new VfsApi(spark, root)
      .init("""{"vector_dimension": 5, "truncate_data": false}""").status === 400)
  }

  test("error taxonomy: search before init, bad search_type, missing id") {
    val fresh = new VfsApi(spark,
      Files.createTempDirectory("vfs-api2").toString)
    assert(fresh.search("""{"values": [1.0]}""").status === 400)
    assert(api.search(
      """{"values": [0.1,0.2,0.3,0.4], "search_type": "nope"}""").status === 400)
    assert(api.getVector(9999L).status === 404)
    assert(api.search("""{"values": [0.1]}""").status === 400) // dim mismatch
  }
}
