package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.Http

/** S17 — HTTP JSON sources, exercised zero-egress against a loopback
  * HttpServer serving canned MediaWiki-shaped payloads. Semantics
  * pinned to interpro7dw/wikipedia.py (pagination via `continue`,
  * ns==0 + validate filter, HTTP-error→None, bounded transport
  * retries, thumbnail→base64, parsetree infobox fold) and
  * interpro/oracle/pfam.py:69-102 (get_wiki composition + min_hours
  * gate).
  */
class HttpSourceSpec extends SparkSpec {

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(status, body.length)
    val os: OutputStream = ex.getResponseBody
    os.write(body); os.close()
  }
  private def respond(ex: HttpExchange, status: Int, body: String): Unit =
    respond(ex, status, body.getBytes(UTF_8))

  private def withServer[A](routes: (String, HttpExchange => Unit)*)(f: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => try h(ex) finally ex.close())
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("extLinks follows continue tokens and filters ns/validate") {
    withServer("/w/api.php" -> { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (q.contains("euoffset=100"))
        // page 2: terminal (no continue)
        respond(ex, 200,
          """{"query":{"exturlusage":[
            |{"ns":0,"title":"Kringle domain","url":"http://pfam.xfam.org/family/PF00051"},
            |{"ns":0,"title":"Off-site page","url":"http://elsewhere.org/x"}
            |]}}""".stripMargin)
      else
        respond(ex, 200,
          """{"continue":{"euoffset":"100","continue":"-||"},
            |"query":{"exturlusage":[
            |{"ns":0,"title":"SH3 domain","url":"http://pfam.xfam.org/family/PF00018"},
            |{"ns":4,"title":"Wikipedia:Sandbox","url":"http://pfam.xfam.org/family/PF00018"}
            |]}}""".stripMargin)
    }) { base =>
      val titles = Http.extLinks(s"$base/w/api.php", "pfam.xfam.org",
        validate = _.contains("pfam.xfam.org"))
      assert(titles === Set("SH3 domain", "Kringle domain"))
    }
  }

  test("getSummary returns None on HTTP error and parses on success") {
    withServer("/summary/" -> { ex =>
      val path = ex.getRequestURI.getPath
      if (path.endsWith("SH3_domain"))
        respond(ex, 200,
          """{"title":"SH3 domain","timestamp":"2020-04-14T10:10:52Z",
            |"extract_html":"<p>The SH3 domain…</p>"}""".stripMargin)
      else respond(ex, 404, """{"type":"not_found"}""")
    }) { base =>
      val ok = Http.getSummary(s"$base/summary/", "SH3_domain")
      assert(ok.exists(_.path("title").asText() == "SH3 domain"))
      assert(Http.getSummary(s"$base/summary/", "No_such_page").isEmpty)
    }
  }

  test("get retries transport failures up to maxRetries then succeeds") {
    val calls = new AtomicInteger(0)
    withServer("/flaky" -> { ex =>
      // first two connections die before any response bytes → the
      // client sees an IOException (the IncompleteRead analogue,
      // wikipedia.py:66-75); the third succeeds
      if (calls.incrementAndGet() <= 2) ex.close()
      else respond(ex, 200, """{"ok":true}""")
    }) { base =>
      val json = Http.fetchJson(s"$base/flaky", maxRetries = 4)
      assert(json.exists(_.path("ok").asBoolean()))
      // ≥3 server-side connections: the JDK client may add its own
      // idempotent-GET retry on top of our attempts, so the exact
      // count is not contract — recovering within maxRetries is
      assert(calls.get() >= 3)
    }
    // and a permanently-dead endpoint exhausts retries with IOException
    val dead = new AtomicInteger(0)
    withServer("/dead" -> { ex => dead.incrementAndGet(); ex.close() }) { base =>
      intercept[java.io.IOException] {
        Http.get(s"$base/dead", maxRetries = 2)
      }
      assert(dead.get() >= 3) // at least initial try + 2 retries
    }
  }

  test("getThumbnail base64s the fetched bytes; absent key → None") {
    val png = Array[Byte](0x50, 0x4E, 0x47, 0x00, 0x7F)
    withServer("/thumb.png" -> { ex => respond(ex, 200, png) }) { base =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val withThumb = mapper.readTree(
        s"""{"thumbnail":{"source":"$base/thumb.png","width":40}}""")
      assert(Http.getThumbnail(withThumb) ===
        Some(java.util.Base64.getEncoder.encodeToString(png)))
      val noThumb = mapper.readTree("""{"title":"x"}""")
      assert(Http.getThumbnail(noThumb).isEmpty)
    }
  }

  test("getWiki canonicalizes, applies min_hours, assembles the article") {
    withServer(
      "/summary/" -> { ex =>
        val path = ex.getRequestURI.getPath
        if (path.endsWith("SH3_domain"))
          respond(ex, 200,
            """{"title":"SH3 domain","timestamp":"2024-01-01T00:00:00Z",
              |"extract_html":"<p>abc</p>"}""".stripMargin)
        else respond(ex, 404, "{}")
      }) { base =>
      val now = Instant.parse("2024-01-02T00:00:00Z") // 24h after last edit
      // spaces canonicalize to underscores (pfam.py:77)
      val art = Http.getWiki(s"$base/summary/", "SH3 domain", minHours = 0, now = now)
      assert(art === Some(("SH3_domain", "<p>abc</p>", None)))
      // min_hours above the article age → skipped (pfam.py:88-92)
      assert(Http.getWiki(s"$base/summary/", "SH3 domain", minHours = 48, now = now).isEmpty)
      // and at/below the age → kept
      assert(Http.getWiki(s"$base/summary/", "SH3 domain", minHours = 12, now = now).nonEmpty)
    }
  }

  test("parseInfobox folds template parts into a multi-valued map") {
    val parsetree =
      """<root><template><title>Infobox protein family</title>
        |<part><name> Symbol </name><value> SH3 </value></part>
        |<part><name>Pfam</name><value>PF00018</value></part>
        |<part><name>Pfam</name><value>PF14604</value></part>
        |<part><name>empty</name><value>  </value></part>
        |</template></root>""".stripMargin
    withServer("/w/api.php" -> { ex =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper().createObjectNode()
      node.putObject("parse").putObject("parsetree").put("*", parsetree)
      respond(ex, 200, node.toString)
    }) { base =>
      val props = Http.parseInfobox(s"$base/w/api.php", "SH3 domain")
      assert(props === Map(
        "symbol" -> Set("SH3"),
        "pfam" -> Set("PF00018", "PF14604")))
      // validate drops pairs (wikipedia.py:144)
      val only = Http.parseInfobox(s"$base/w/api.php", "SH3 domain",
        validate = (n, _) => n == "pfam")
      assert(only.keySet === Set("pfam"))
    }
  }

  test("wikiArticles builds a broadcast-sized DataFrame; missing titles drop") {
    withServer("/summary/" -> { ex =>
      val path = ex.getRequestURI.getPath
      if (path.endsWith("SH3_domain"))
        respond(ex, 200,
          """{"title":"SH3 domain","timestamp":"2024-01-01T00:00:00Z",
            |"extract_html":"<p>abc</p>"}""".stripMargin)
      else respond(ex, 404, "{}")
    }) { base =>
      val df = Http.wikiArticles(spark, s"$base/summary/",
        Seq("SH3 domain", "No such page"),
        now = Instant.parse("2024-06-01T00:00:00Z"))
      val rows = df.collect()
      assert(rows.length === 1)
      assert(rows(0).getString(0) === "SH3_domain")
      assert(df.columns.toSeq === Seq("title", "extract_html", "thumbnail_b64"))
    }
  }

  test("fetchJsonDistributed fans URL fetches across partitions") {
    withServer("/doc" -> { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (q.contains("id=bad")) respond(ex, 404, """{"err":"no"}""")
      else respond(ex, 200, s"""{"q":"$q"}""")
    }) { base =>
      import spark.implicits._
      val urls = (1 to 8).map(i => s"$base/doc?id=$i") :+ s"$base/doc?id=bad"
      val out = Http.fetchJsonDistributed(urls.toDS().repartition(4)).collect()
      assert(out.length === 9)
      val byStatus = out.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
      assert(byStatus === Map(200 -> 8, 404 -> 1))
    }
  }
}
