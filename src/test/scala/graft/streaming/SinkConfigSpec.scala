package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** S5 per-app auth/option surface (reference: routes/makeRouter.js:14-24 —
  * the per-app token map and its missing-token error).
  */
class SinkConfigSpec extends AnyFunSuite {

  test("per-app registry resolves each app's credentials") {
    val reg = SinkConfig.registry(
      SinkConfig("order", credentials = Map("apiToken" -> "tok-order")),
      SinkConfig("process", credentials = Map("apiToken" -> "tok-process")),
      SinkConfig("inventory", credentials = Map("apiToken" -> "tok-inventory")))
    assert(reg("order").token === "tok-order")
    assert(reg("process").token === "tok-process")
    assert(reg.get("nope").isEmpty)
  }

  test("missing app or missing token fails like the reference") {
    val reg = SinkConfig.registry(SinkConfig("order"))
    val e1 = intercept[NoSuchElementException](reg("unknown"))
    assert(e1.getMessage.contains("No API token found for app ID unknown"))
    val e2 = intercept[NoSuchElementException](reg("order").token)
    assert(e2.getMessage.contains("No API token found for app ID order"))
  }

  test("reader options and checkpoint location ride the config") {
    val c = SinkConfig("order",
      readerOptions = Map("maxFilesPerTrigger" -> "1"),
      checkpointLocation = Some("/tmp/ckpt"))
    assert(c.readerOptions("maxFilesPerTrigger") === "1")
    assert(c.checkpointLocation.contains("/tmp/ckpt"))
  }
}
