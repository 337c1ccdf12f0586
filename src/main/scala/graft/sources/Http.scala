package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{Duration, Instant}
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types._

/** S17 — external HTTP JSON sources (SURVEY.md §2.1).
  *
  * Reference behavior: interpro7dw/wikipedia.py drives the MediaWiki
  * APIs driver-side — `get_ext_links` (wikipedia.py:19-50) walks a
  * paginated `exturlusage` query following `continue` tokens and keeps
  * ns==0 article titles that pass an optional URL validator;
  * `get_summary` (wikipedia.py:53-80) fetches the REST summary with a
  * bounded retry loop, returning None on an HTTP error;
  * `get_thumbnail` (wikipedia.py:84-110) downloads the summary's
  * thumbnail bytes and base64-encodes them; `parse_infobox`
  * (wikipedia.py:113-150) fetches the page's parsetree XML and folds
  * `template/part` name→value pairs into a multi-valued dict;
  * `pfam.get_wiki` (interpro/oracle/pfam.py:69-102) composes the
  * above: canonicalize the title, fetch the summary, drop articles
  * edited less than `min_hours` ago, return {title, extract_html,
  * thumbnail}.
  *
  * Spark posture: the base URL is injected (so the zero-egress spec
  * serves canned payloads from a loopback HttpServer), the dimension
  * fetches stay driver-side exactly like the reference (a few thousand
  * Pfam titles — broadcast-sized), and the only bulk surface,
  * fetch-many-URLs, is distributed: `fetchJsonDistributed` runs one
  * HttpClient per partition over a Dataset of URLs, so a 100M-row URL
  * column fans out across executors instead of looping on the driver.
  */
object Http {

  private val mapper = new ObjectMapper()

  private def client(): HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** GET `url`, returning (status, body bytes). Retries transport-level
    * failures (the reference's IncompleteRead handling,
    * wikipedia.py:66-75) up to `maxRetries` times; an HTTP error
    * status is returned to the caller, not retried (wikipedia.py:
    * 68-70 breaks on HTTPError).
    */
  def get(url: String, headers: Map[String, String] = Map.empty,
          maxRetries: Int = 4, retrySleepMs: Long = 0L,
          cl: HttpClient = client()): (Int, Array[Byte]) = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = b.build()
    var attempt = 0
    while (true) {
      try {
        val res = cl.send(req, HttpResponse.BodyHandlers.ofByteArray())
        return (res.statusCode(), res.body())
      } catch {
        case e: java.io.IOException =>
          if (attempt == maxRetries) throw e
          attempt += 1
          if (retrySleepMs > 0) Thread.sleep(retrySleepMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** GET + JSON parse; None on a non-2xx status (reference: HTTPError
    * breaks with obj=None, wikipedia.py:68-70,78).
    */
  def fetchJson(url: String, headers: Map[String, String] = Map.empty,
                maxRetries: Int = 4): Option[JsonNode] = {
    val (status, body) = get(url, headers, maxRetries)
    if (status >= 200 && status < 300) Some(mapper.readTree(body)) else None
  }

  private def urlencode(params: Seq[(String, String)]): String =
    params.map { case (k, v) =>
      URLEncoder.encode(k, UTF_8) + "=" + URLEncoder.encode(v, UTF_8)
    }.mkString("&")

  /** `get_ext_links` (wikipedia.py:19-50): walk the paginated
    * `list=exturlusage` query, following every key the server returns
    * under `continue` verbatim into the next request's params, until
    * no `continue` object comes back. Keeps titles of ns==0 pages
    * whose url passes `validate`.
    */
  def extLinks(apiBase: String, query: String,
               validate: String => Boolean = _ => true,
               euLimit: Int = 100): Set[String] = {
    var params = Vector(
      "action" -> "query", "format" -> "json", "list" -> "exturlusage",
      "euquery" -> query, "eulimit" -> euLimit.toString)
    val pages = scala.collection.mutable.Set.empty[String]
    var done = false
    while (!done) {
      val url = s"$apiBase?${urlencode(params)}"
      val data = fetchJson(url).getOrElse(
        throw new java.io.IOException(s"exturlusage fetch failed: $url"))
      data.path("query").path("exturlusage").elements().asScala.foreach { obj =>
        if (obj.path("ns").asInt(-1) == 0) {
          val title = obj.path("title").asText()
          val extUrl = obj.path("url").asText()
          if (validate(extUrl)) pages += title
        }
      }
      val cont = data.path("continue")
      if (cont.isMissingNode || !cont.fields().hasNext) done = true
      else {
        val updates = cont.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toVector
        val updatedKeys = updates.map(_._1).toSet
        params = params.filterNot(p => updatedKeys(p._1)) ++ updates
      }
    }
    pages.toSet
  }

  /** `get_summary` (wikipedia.py:53-80): unquote %xx escapes, quote the
    * title with '/' escaped too, fetch with retries; None on HTTP error.
    */
  def getSummary(restBase: String, title: String,
                 maxRetries: Int = 4): Option[JsonNode] = {
    val unquoted = java.net.URLDecoder.decode(title, UTF_8)
    val quoted = URLEncoder.encode(unquoted, UTF_8).replace("+", "%20")
    fetchJson(restBase + quoted, maxRetries = maxRetries)
  }

  /** `get_thumbnail` (wikipedia.py:84-110): follow summary.thumbnail
    * .source, base64 the bytes; None when the summary has no thumbnail
    * or the fetch errors.
    */
  def getThumbnail(summary: JsonNode, maxRetries: Int = 4): Option[String] = {
    val thumb = summary.path("thumbnail")
    if (thumb.isMissingNode) return None
    val src = thumb.path("source").asText()
    val (status, body) = get(src, maxRetries = maxRetries)
    if (status >= 200 && status < 300) Some(Base64.getEncoder.encodeToString(body))
    else None
  }

  /** `pfam.get_wiki` (interpro/oracle/pfam.py:69-102): canonicalize
    * spaces→underscores, fetch the summary, parse its `timestamp`
    * (ISO-8601 Z), skip articles edited under `minHours` ago, else
    * return (title, extract_html, thumbnail). `now` is injected for
    * determinism (the reference reads the wall clock).
    */
  def getWiki(restBase: String, title: String, minHours: Int = 0,
              now: Instant = Instant.now()): Option[(String, String, Option[String])] = {
    val canonical = title.replace(" ", "_")
    getSummary(restBase, canonical).flatMap { summary =>
      val ts = Instant.parse(summary.path("timestamp").asText())
      val hoursSince = java.time.Duration.between(ts, now).getSeconds / 3600.0
      if (minHours > 0 && hoursSince < minHours) None
      else Some((canonical, summary.path("extract_html").asText(),
                 getThumbnail(summary)))
    }
  }

  /** `parse_infobox` (wikipedia.py:113-150): fetch action=parse
    * parsetree JSON, parse the embedded XML, fold template/part
    * name→value pairs (lowercased, trimmed, both non-empty, passing
    * `validate`) into a multi-valued map.
    */
  def parseInfobox(apiBase: String, page: String,
                   validate: (String, String) => Boolean = (_, _) => true)
      : Map[String, Set[String]] = {
    val url = s"$apiBase?${urlencode(Seq(
      "action" -> "parse", "page" -> page, "format" -> "json",
      "prop" -> "parsetree"))}"
    val data = fetchJson(url).getOrElse(
      throw new java.io.IOException(s"parsetree fetch failed: $url"))
    val tree = data.path("parse").path("parsetree").path("*")
    if (tree.isMissingNode) return Map.empty  // page does not exist
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(tree.asText().getBytes(UTF_8)))
    val props = scala.collection.mutable.Map.empty[String, Set[String]]
    val templates = doc.getDocumentElement.getElementsByTagName("template")
    for (i <- 0 until templates.getLength) {
      val tmpl = templates.item(i).asInstanceOf[org.w3c.dom.Element]
      val parts = tmpl.getElementsByTagName("part")
      for (j <- 0 until parts.getLength) {
        val part = parts.item(j).asInstanceOf[org.w3c.dom.Element]
        def childText(tag: String): Option[String] = {
          val ns = part.getElementsByTagName(tag)
          if (ns.getLength == 0) None
          else Option(ns.item(0).getTextContent).map(_.trim)
        }
        (childText("name").map(_.toLowerCase), childText("value")) match {
          case (Some(name), Some(value)) if name.nonEmpty && value.nonEmpty =>
            if (validate(name, value))
              props(name) = props.getOrElse(name, Set.empty) + value
          case _ =>
        }
      }
    }
    props.toMap
  }

  /** Driver-side dimension assembly (the reference pattern,
    * pfam.py:33-64): fetch each title's wiki article and return a small
    * DataFrame suitable for `broadcast()` into the entry join.
    */
  def wikiArticles(spark: SparkSession, restBase: String,
                   titles: Seq[String], minHours: Int = 0,
                   now: Instant = Instant.now()): DataFrame = {
    val rows = titles.flatMap(getWiki(restBase, _, minHours, now)).map {
      case (t, extract, thumb) => Row(t, extract, thumb.orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("title", StringType, nullable = false),
        StructField("extract_html", StringType, nullable = true),
        StructField("thumbnail_b64", StringType, nullable = true))))
  }

  /** The bulk path: fetch every URL in a Dataset, one HttpClient per
    * partition, returning (url, status, body). This is the shape that
    * scales — a URL column fans out over executors; driver-side loops
    * stay reserved for broadcast-sized dimensions.
    */
  def fetchJsonDistributed(urls: Dataset[String],
                           maxRetries: Int = 4): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val fetched = urls.mapPartitions { it =>
      val cl = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(10)).build()
      it.map { url =>
        try {
          val (status, body) = get(url, maxRetries = maxRetries, cl = cl)
          (url, status, new String(body, UTF_8))
        } catch {
          case e: java.io.IOException => (url, -1, e.getMessage)
        }
      }
    }
    fetched.toDF("url", "status", "body")
  }
}
