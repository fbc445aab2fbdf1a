package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** HTML/DOM boilerplate stripper with text-density heuristics — the
  * kind='text' span path (north_star). The reference's analog is the
  * PyPDF2 digital-text extraction stub (orc_script notebook cell 3);
  * the semantics here are defined by this engine and pinned by goldens
  * (SURVEY §7.3 "Boilerplate strip").
  *
  * Rules (deterministic, order matters):
  *  1. <!-- comments --> and the contents of script/style/nav/header/
  *     footer/aside/head/title containers are dropped wholesale
  *     (nesting-aware).
  *  2. Remaining markup is segmented into blocks at block-level tags
  *     (p, div, h1-h6, li, ul, ol, table, tr, td, th, section, article,
  *     blockquote, pre, br, body, html).
  *  3. Per block, on entity-decoded whitespace-collapsed text:
  *     keep iff len >= MinBlockChars
  *          && 2 * linkChars <= len          (link-density filter)
  *          && len / (1 + inlineTags) >= MinDensity (text-density filter).
  *  4. Kept blocks joined with "\n".
  */
object BoilerplateStrip {
  val MinBlockChars = 15
  val MinDensity = 10

  private val dropContainers = Set(
    "script", "style", "nav", "header", "footer", "aside", "head", "title")
  private val blockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "section", "article", "blockquote", "pre",
    "br", "body", "html")

  def strip(markup: String): String = {
    val blocks = new ArrayBuffer[String]
    val text = new StringBuilder
    val linkText = new StringBuilder
    var inlineTags = 0
    var dropDepth = 0
    var aDepth = 0

    def finalizeBlock(): Unit = {
      val t = collapse(decodeEntities(text.toString))
      val lt = collapse(decodeEntities(linkText.toString))
      if (t.length >= MinBlockChars && 2 * lt.length <= t.length &&
          t.length / (1 + inlineTags) >= MinDensity)
        blocks += t
      text.setLength(0)
      linkText.setLength(0)
      inlineTags = 0
    }

    var i = 0
    val n = markup.length
    while (i < n) {
      val c = markup.charAt(i)
      if (c == '<') {
        if (markup.startsWith("<!--", i)) {
          val end = markup.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val gt = markup.indexOf('>', i + 1)
          if (gt < 0) { i = n } // malformed tail: ignore
          else {
            val inner = markup.substring(i + 1, gt).trim
            val closing = inner.startsWith("/")
            val body = if (closing) inner.substring(1) else inner
            val name = body.takeWhile(ch => ch.isLetterOrDigit).toLowerCase
            val selfClosing = inner.endsWith("/")
            if (dropContainers(name)) {
              if (!selfClosing) {
                if (closing) dropDepth = math.max(0, dropDepth - 1)
                else dropDepth += 1
              }
            } else if (dropDepth == 0 && name.nonEmpty) {
              if (blockTags(name)) finalizeBlock()
              else {
                // inline tag inside a block
                if (!closing) inlineTags += 1
                if (name == "a") {
                  if (closing) aDepth = math.max(0, aDepth - 1)
                  else if (!selfClosing) aDepth += 1
                }
              }
            }
            i = gt + 1
          }
        }
      } else {
        val lt = markup.indexOf('<', i)
        val end = if (lt < 0) n else lt
        if (dropDepth == 0) {
          val seg = markup.substring(i, end)
          text.append(seg)
          if (aDepth > 0) linkText.append(seg)
        }
        i = end
      }
    }
    finalizeBlock()
    blocks.mkString("\n")
  }

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    s.replace("&nbsp;", " ")
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&#39;", "'")
      .replace("&apos;", "'")
      .replace("&amp;", "&")
  }

  private val ws = java.util.regex.Pattern.compile("\\s+")

  def collapse(s: String): String =
    ws.matcher(s).replaceAll(" ").trim
}
