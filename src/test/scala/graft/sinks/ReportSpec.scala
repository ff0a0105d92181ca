package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

class ReportSpec extends AnyFunSuite {

  test("markdown table: header, ---|separator by comma count, body — StreamTest.cpp:91-111") {
    val md = Report.csvLinesToMarkdown(Seq("a,b,c", "1,2,3", "4,5,6"))
    assert(md === "|a,b,c|\n|---|---|---|\n|1,2,3|\n|4,5,6|\n")
    assert(Report.csvLinesToMarkdown(Nil) === "")
  }

  test("webhook escaping: backslash, quote, newline, CR — HttpServer.cpp:108-123") {
    assert(Report.safeMessage("""a\b"c""" + "\nd\re") === """a\\b\"c\nde""")
  }

  test("truncation at the 18,000 boundary — HttpServer.cpp:126-129") {
    val just = "x" * 18000
    assert(Report.safeMessage(just) === just) // exactly at the cap: untouched
    val over = "x" * 18001
    val got = Report.safeMessage(over)
    assert(got.length === 17900 + Report.TruncationSuffix.length)
    assert(got.startsWith("x" * 17900))
    assert(got.endsWith(Report.TruncationSuffix))
    // escaping happens BEFORE the length check (a \n doubles in size)
    val sneaky = ("y\n" * 9500)
    assert(Report.safeMessage(sneaky).length === 17900 + Report.TruncationSuffix.length)
  }

  test("program report batching: first batch carries the total — StreamTest.cpp:516-531") {
    val msgs = Report.programReport("2026-01-01", (1 to 65).map(i => s"P$i"), 30)
    assert(msgs.length === 3)
    assert(msgs.head.contains("detected 65 programs"))
    assert(msgs.head.contains("(batch 1/3)"))
    assert(!msgs(1).contains("detected 65"))
    assert(msgs(1).contains("(batch 2/3)"))
    assert(msgs(2).contains("P65"))
    val empty = Report.programReport("2026-01-01", Nil)
    assert(empty.length === 1)
    assert(empty.head.contains("no qualifying programs"))
  }

  test("vendor report: 2 per message, pct 0 when total 0 — StreamTest.cpp:560-607, h:116-118") {
    val stats = Seq(
      Report.VendorStat("A", 1, 2, 2, 5),
      Report.VendorStat("B", 0, 0, 0, 0),
      Report.VendorStat("C", 3, 0, 0, 3))
    val msgs = Report.vendorReport("2026-01-01", stats, 2)
    assert(msgs.length === 2)
    assert(msgs.head.contains("A flow-quality stats"))
    assert(msgs.head.contains("<60: 1 (20.0%)"))
    assert(msgs.head.contains("60~80: 0 (0.0%)")) // total=0 → 0.0, no NaN
    assert(msgs(1).contains("C flow-quality stats"))
  }

  test("collecting sink wraps messages in the webhook JSON envelope") {
    val sink = new Report.CollectingSink
    sink.send("hello \"world\"")
    assert(sink.sent.head ===
      """{"msg_type":"text","content":{"text":"hello \"world\""}}""")
  }

  test("HttpSink POSTs the JSON envelope to a real local server (S10)") {
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val received = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var status = 200
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        received.synchronized {
          received += ((ex.getRequestHeaders.getFirst("Content-Type"), body))
        }
        ex.sendResponseHeaders(status, -1)
        ex.close()
      }
    })
    server.start()
    try {
      val uri = java.net.URI.create(
        s"http://127.0.0.1:${server.getAddress.getPort}/hook")
      val sink = new Report.HttpSink(uri)
      assert(sink.send("""alert: "P7" down"""))
      assert(received.size === 1)
      assert(received.head._1 === "application/json")
      assert(received.head._2 ===
        """{"msg_type":"text","content":{"text":"alert: \"P7\" down"}}""")
      // big payloads arrive truncated by the 18k guard
      assert(sink.send("x" * 40000))
      assert(received(1)._2.length <=
        Report.TrimTo + Report.TruncationSuffix.length + 60)
      // non-2xx → false, and failures never throw
      status = 500
      assert(!sink.send("again"))
      assert(!new Report.HttpSink(
        java.net.URI.create("http://127.0.0.1:1/nope")).send("unreachable"))
    } finally server.stop(0)
  }
}
