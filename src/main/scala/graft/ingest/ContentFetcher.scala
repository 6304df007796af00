package graft.ingest

import java.security.MessageDigest

/** Article-content fetching kernel (reference etl_pipeline/
  * content_extractor.py — S7/S8). The trait is the seam between the Spark
  * dataflow (mapPartitions, one fetcher per partition — the analogue of the
  * reference's per-thread session reuse, link_extractor.py:167) and the
  * I/O: a real impl wraps an HTTP client; the fixture returns deterministic
  * HTML derived from md5(url) and fails every 13th URL to exercise
  * row-level fault tolerance (S9, content_extractor.py:194-199).
  */
trait ContentFetcher extends Serializable {
  /** Left(error) | Right(html). */
  def fetchHtml(url: String): Either[String, String]
}

object FixtureFetcher extends ContentFetcher {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Deterministic page: one h1; a nav div with short boilerplate blocks; a
    * main div whose paragraphs hold most of the text (the A1 heuristic must
    * pick it); a footer with boilerplate the cleaner must null out.
    */
  def fetchHtml(url: String): Either[String, String] = {
    val h = md5hex(url)
    if (h.charAt(0) == 'f' && h.charAt(1) < '4') Left(s"fetch failed: $url")
    else {
      val nPars = 3 + (h.charAt(2) - '0').max(0) % 4
      val words = Seq("market", "analyst", "quarter", "growth", "revenue",
        "product", "launch", "report", "investor", "technology", "industry",
        "forecast", "earnings", "strategy", "partnership", "acquisition")
      def sentence(i: Int, j: Int): String = {
        val w = (0 until 12).map(k => words((h.charAt((i + k) % 32) + j + k) % words.size))
        w.mkString(" ").capitalize + " according to the fixture article."
      }
      val mainPars = (0 until nPars).map { i =>
        s"<p>${sentence(i, 0)} ${sentence(i, 1)} ${sentence(i, 2)}</p>"
      }.mkString("\n      ")
      Right(s"""<html>
        |  <head><title>t-$h</title></head>
        |  <body>
        |    <div class="nav"><p>Menu</p><p>Search</p></div>
        |    <h1>Fixture headline ${h.take(12)} with enough length</h1>
        |    <div class="main">
        |      $mainPars
        |    </div>
        |    <div class="footer"><p>Subscribe to our newsletter for updates and please accept our cookie policy today.</p></div>
        |  </body>
        |</html>""".stripMargin)
    }
  }
}
