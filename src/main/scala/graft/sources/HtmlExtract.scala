package graft.sources

import scala.collection.mutable

/** Selector-lite HTML row extraction — the offline twin of the
  * reference's DOM scrape (restaurant-crawler/restaurant-crawler.py:313
  * `query_selector_all("li.UEzoS")`, field extraction `:168-178`): a
  * single-pass tag tokenizer builds a lightweight element tree, and
  * `tag.class` selectors pull row elements and their fields. Browser
  * automation itself stays OUT (non-determinism quarantine, SURVEY
  * §7.5.5) — this parses already-rendered page BYTES, wherever they
  * came from (HttpConnector.get, a WARC dump, a checked-in fixture),
  * into the typed rows [[PagedSource.fetch]] fans out.
  *
  * Parser scope (what real scrape targets need, no more): tags with
  * quoted/unquoted attributes, void elements, raw-text script/style,
  * comments and doctypes skipped, basic entity decoding, and
  * forgiving recovery on mismatched closes (pop-until-match;
  * stray closes ignored) plus the li/p/tr/td/option implied-close
  * rule — the quirks actual crawl HTML exhibits. Not a spec-complete
  * HTML5 tree builder; LiveHttpSpec/SourcesSpec pin the behaviors
  * extraction depends on.
  */
object HtmlExtract {

  /** An element node. Children are text runs (Left) or elements
    * (Right) in document order. */
  final case class Node(tag: String, attrs: Map[String, String],
                        children: Vector[Either[String, Node]]) {
    def classes: Set[String] =
      attrs.getOrElse("class", "").split("\\s+").iterator.filter(_.nonEmpty).toSet
    def attr(name: String): Option[String] = attrs.get(name)
    /** Concatenated descendant text, outer whitespace trimmed. */
    def innerText: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n.children.foreach {
        case Left(t)  => sb.append(t)
        case Right(c) => walk(c)
      }
      walk(this)
      sb.toString.trim
    }
  }

  private val VOID = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "source", "track", "wbr")
  private val RAW_TEXT = Set("script", "style")
  /** Opening one of these while the SAME tag is open implies closing
    * the open one first (the list-item quirk real pages rely on). */
  private val IMPLIED_CLOSE = Set("li", "p", "tr", "td", "th", "option")

  private def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val ent = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        ent match {
          case "amp"  => sb.append('&'); i = semi + 1
          case "lt"   => sb.append('<'); i = semi + 1
          case "gt"   => sb.append('>'); i = semi + 1
          case "quot" => sb.append('"'); i = semi + 1
          case "apos" => sb.append('\''); i = semi + 1
          case "nbsp" => sb.append(' '); i = semi + 1
          case e if e != null && e.startsWith("#x") || e != null && e.startsWith("#X") =>
            try { sb.appendAll(Character.toChars(Integer.parseInt(e.drop(2), 16))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          case e if e != null && e.startsWith("#") =>
            try { sb.appendAll(Character.toChars(Integer.parseInt(e.drop(1)))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse a page into a synthetic root element (`tag = "#root"`)
    * holding the top-level nodes. Never throws on malformed input —
    * recovery rules in the object scaladoc. */
  def parse(html: String): Node = {
    // mutable frame: (tag, attrs, children-so-far)
    final class Frame(val tag: String, val attrs: Map[String, String]) {
      val children = Vector.newBuilder[Either[String, Node]]
    }
    val stack = mutable.Stack(new Frame("#root", Map.empty))
    def closeTop(): Unit = {
      val f = stack.pop()
      stack.top.children += Right(Node(f.tag, f.attrs, f.children.result()))
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) stack.top.children += Left(decodeEntities(html.substring(i)))
        i = n
      } else {
        if (lt > i) stack.top.children += Left(decodeEntities(html.substring(i, lt)))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && html.charAt(lt + 1) == '!') {
          val end = html.indexOf('>', lt)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          val end = html.indexOf('>', lt)
          val tag = html.substring(lt + 2, if (end < 0) n else end).trim.toLowerCase
          // pop-until-match; a close with no matching open is ignored
          if (stack.exists(_.tag == tag)) {
            while (stack.top.tag != tag) closeTop()
            closeTop()
          }
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', lt)
          if (end < 0) { i = n } // truncated tag: drop it
          else {
            var body = html.substring(lt + 1, end)
            val selfClosing = body.endsWith("/")
            if (selfClosing) body = body.dropRight(1)
            val (tag, attrs) = parseTag(body)
            if (tag.nonEmpty) {
              if (IMPLIED_CLOSE.contains(tag) && stack.top.tag == tag) closeTop()
              if (selfClosing || VOID.contains(tag))
                stack.top.children += Right(Node(tag, attrs, Vector.empty))
              else if (RAW_TEXT.contains(tag)) {
                // raw text: everything until the matching close tag
                val close = s"</$tag"
                val idx = html.toLowerCase.indexOf(close, end + 1)
                val stop = if (idx < 0) n else idx
                val raw = html.substring(end + 1, stop)
                stack.top.children += Right(Node(tag, attrs, Vector(Left(raw))))
                val gt = html.indexOf('>', stop)
                i = if (idx < 0 || gt < 0) n else gt + 1
              } else stack.push(new Frame(tag, attrs))
            }
            if (!RAW_TEXT.contains(tag) || VOID.contains(tag) || selfClosing)
              i = end + 1
          }
        }
        if (lt >= i) i = lt + 1 // safety: always advance
      }
    }
    while (stack.size > 1) closeTop() // unclosed tags at EOF
    val root = stack.pop()
    Node(root.tag, root.attrs, root.children.result())
  }

  private def parseTag(body: String): (String, Map[String, String]) = {
    var i = 0
    val n = body.length
    def skipWs(): Unit = while (i < n && body.charAt(i).isWhitespace) i += 1
    def name(): String = {
      val s = i
      while (i < n && !body.charAt(i).isWhitespace && body.charAt(i) != '=') i += 1
      body.substring(s, i)
    }
    skipWs()
    val tag = name().toLowerCase
    val attrs = Map.newBuilder[String, String]
    while (i < n) {
      skipWs()
      if (i < n) {
        val an = name().toLowerCase
        if (an.nonEmpty) {
          skipWs()
          if (i < n && body.charAt(i) == '=') {
            i += 1; skipWs()
            val v =
              if (i < n && (body.charAt(i) == '"' || body.charAt(i) == '\'')) {
                val q = body.charAt(i); i += 1
                val s = i
                while (i < n && body.charAt(i) != q) i += 1
                val out = body.substring(s, i)
                if (i < n) i += 1
                out
              } else {
                val s = i
                while (i < n && !body.charAt(i).isWhitespace) i += 1
                body.substring(s, i)
              }
            attrs += an -> decodeEntities(v)
          } else attrs += an -> "" // bare attribute
        } else i += 1
      }
    }
    (tag, attrs.result())
  }

  /** Parse one simple selector step: `tag`, `.class`, `tag.c1.c2`. */
  private def step(sel: String): Node => Boolean = {
    val parts = sel.split('.')
    val tag = parts.headOption.getOrElse("").toLowerCase
    val classes = parts.drop(1).filter(_.nonEmpty).toSet
    n => (tag.isEmpty || n.tag == tag) && classes.subsetOf(n.classes)
  }

  /** All DESCENDANT elements of `root` matching a selector — single
    * step (`li.UEzoS`) or whitespace-separated descendant chain
    * (`ul.list li.row`), document order, root itself excluded (the
    * query_selector contract). */
  def select(root: Node, selector: String): Seq[Node] = {
    val steps = selector.trim.split("\\s+").toSeq.map(step)
    def descend(n: Node, p: Node => Boolean): Vector[Node] =
      n.children.collect { case Right(c) => c }.flatMap { c =>
        (if (p(c)) Vector(c) else Vector.empty) ++ descend(c, p)
      }
    steps.foldLeft(Vector(root)) { (nodes, p) =>
      nodes.flatMap(descend(_, p)).distinct
    }
  }

  /** First match or None — the `query_selector` twin. */
  def selectFirst(root: Node, selector: String): Option[Node] =
    select(root, selector).headOption

  /** One extracted field: first `selector` match inside the row, then
    * inner text (or `attr`), then an optional regex whose FIRST GROUP
    * is the value (the place-id-from-href move,
    * restaurant-crawler.py:180-196); `default` when any step misses —
    * mirroring the reference's per-field fallbacks (`:171`). */
  final case class Field(name: String, selector: String,
                         attr: Option[String] = None,
                         pattern: Option[String] = None,
                         default: String = "")

  /** Extract row maps: one map per `rowSelector` match, fields by
    * [[Field]]. The page-shape contract of the reference's scrape
    * loop, minus the browser. */
  def rows(html: String, rowSelector: String,
           fields: Seq[Field]): Seq[Map[String, String]] = {
    val doc = parse(html)
    select(doc, rowSelector).map { row =>
      fields.map { f =>
        val raw = selectFirst(row, f.selector).flatMap { el =>
          f.attr match {
            case Some(a) => el.attr(a)
            case None    => Some(el.innerText)
          }
        }
        val v = (raw, f.pattern) match {
          case (Some(s), Some(p)) =>
            p.r.findFirstMatchIn(s).map(_.group(1)).getOrElse(f.default)
          case (Some(s), None) => s
          case (None, _)       => f.default
        }
        f.name -> v
      }.toMap
    }
  }

  /** [[rows]] rendered as compact JSON object strings — the shape
    * [[PagedSource.fetch]] fans out and `from_json` types (schema
    * lives in the query, not the connector — the
    * HttpConnector.jsonArrayElements contract). */
  def jsonRows(html: String, rowSelector: String,
               fields: Seq[Field]): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    rows(html, rowSelector, fields).map { m =>
      val o = mapper.createObjectNode()
      fields.foreach(f => o.put(f.name, m(f.name)))
      o.toString
    }
  }
}
