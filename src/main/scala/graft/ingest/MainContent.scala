package graft.ingest

import scala.collection.mutable

/** Main-content extraction heuristic (reference content_extractor.py:38-109
  * — operator A1): group `<p>` blocks by their parent-tag hierarchy, sum
  * text length per hierarchy, pick the hierarchy with the max total, and
  * emit its paragraphs in document order (joined by \n as the body).
  *
  * Runs per-article INSIDE the fetch map (no shuffle per article — the
  * group-agg-argmax is over one page's blocks, a few dozen rows, so doing
  * it in local Scala beats a corpus-wide explode+groupBy by the width of a
  * shuffle; the relational skeleton of A1 is separately oracled as
  * q14_argmax).
  *
  * The parser is a minimal tag-stack scanner (bs4 stand-in) — sufficient
  * for fixture pages; a production impl would swap in a real HTML parser
  * behind the same function signature.
  */
object MainContent {

  final case class Parsed(title: String, body: String, paragraphs: Seq[String])

  private val tagRe = "(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)([^>]*)>".r

  /** (parentHierarchy, docOrder, text) for every <p>; first <h1> text.
    * Hierarchy entries carry an open-order counter (`div#4`) so two sibling
    * `<div>`s are DISTINCT parents — as bs4's parent object chain is —
    * otherwise nav/main/footer paragraphs would merge into one group.
    */
  def blocks(html: String): (String, Seq[(String, Int, String)]) = {
    val stack = mutable.ArrayBuffer.empty[String]
    val out = mutable.ArrayBuffer.empty[(String, Int, String)]
    var title = ""
    var ord = 0
    var opened = 0
    val ms = tagRe.findAllMatchIn(html).toVector
    var idx = 0
    while (idx < ms.size) {
      val m = ms(idx)
      val closing = m.group(1) == "/"
      val tag = m.group(2).toLowerCase
      if (!closing && (tag == "p" || tag == "h1")) {
        // inner text runs to the matching close tag (fixtures don't nest p/h1)
        val close = ms.indexWhere(x => x.group(1) == "/" && x.group(2).toLowerCase == tag, idx + 1)
        val end = if (close >= 0) ms(close).start else html.length
        val text = html.substring(m.end, end).replaceAll("\\s+", " ").trim
        if (tag == "h1") { if (title.isEmpty) title = text }
        else { out += ((stack.mkString(">"), ord, text)); ord += 1 }
        idx = if (close >= 0) close + 1 else ms.size
      } else {
        if (closing) {
          if (stack.nonEmpty && stack.last.startsWith(tag + "#"))
            stack.remove(stack.size - 1)
        } else if (!m.group(3).endsWith("/")) {
          stack += s"$tag#$opened"
          opened += 1
        }
        idx += 1
      }
    }
    (title, out.toSeq)
  }

  /** A1: argmax hierarchy by total text length (doc-order tie-break), then
    * its paragraphs in document order.
    */
  def extract(html: String): Parsed = {
    val (title, bs) = blocks(html)
    if (bs.isEmpty) Parsed(title, "", Seq.empty)
    else {
      val best = bs.groupBy(_._1).view
        .mapValues(ps => (ps.map(_._3.length).sum, ps.map(_._2).min))
        .toSeq.maxBy { case (_, (total, firstOrd)) => (total, -firstOrd) }._1
      val pars = bs.filter(_._1 == best).sortBy(_._2).map(_._3)
      Parsed(title, pars.mkString("\n"), pars)
    }
  }
}
