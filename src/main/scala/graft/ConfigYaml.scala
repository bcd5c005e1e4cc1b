package graft

/** Minimal YAML-subset parser for `GraftConfig.fromYaml` — covers the
  * exact shape of the reference's config file
  * (/root/reference/configs/config.yaml; loader:
  * /root/reference/pkg/config/config.go:60-89): nested maps by
  * indentation, scalar `key: value` entries, string lists of `- item`
  * lines, full-line and trailing `#` comments, quoted strings, ints,
  * bools, and Go-style duration literals ("60s", "500ms").
  *
  * Hand-rolled on purpose: the build's classpath is frozen (no YAML
  * dependency can resolve), and this subset is the entirety of YAML the
  * config surface uses. Anchors, multi-line scalars, flow collections
  * and nested sequences are out of scope and rejected loudly rather
  * than misparsed.
  */
object ConfigYaml {

  sealed trait Node
  final case class Scalar(value: String) extends Node
  final case class Mapping(entries: Map[String, Node]) extends Node
  final case class Sequence(items: List[String]) extends Node

  /** Parse a YAML document into a root mapping. Throws
    * IllegalArgumentException with a line number on anything outside the
    * supported subset. */
  def parse(text: String): Mapping = {
    val lines = text.linesIterator.zipWithIndex.flatMap { case (raw, i) =>
      val noComment = stripComment(raw)
      if (noComment.trim.isEmpty) None
      else Some(Line(indentOf(noComment, i + 1), noComment.trim, i + 1))
    }.toVector
    if (lines.isEmpty) Mapping(Map.empty)
    else {
      val (node, rest) = parseMapping(lines, lines.head.indent)
      require(rest.isEmpty,
        s"yaml line ${rest.head.number}: unexpected outdent/content '${rest.head.content}'")
      node
    }
  }

  private final case class Line(indent: Int, content: String, number: Int)

  private def parseMapping(lines: Vector[Line], indent: Int): (Mapping, Vector[Line]) = {
    var rest = lines
    var entries = Map.empty[String, Node]
    while (rest.nonEmpty && rest.head.indent == indent &&
           !rest.head.content.startsWith("- ")) {
      val Line(_, t, ln) = rest.head
      val ci = t.indexOf(':')
      require(ci > 0, s"yaml line $ln: expected 'key: value' or 'key:', got '$t'")
      val key = t.substring(0, ci).trim
      val inline = t.substring(ci + 1).trim
      rest = rest.tail
      val node: Node =
        if (inline.nonEmpty) Scalar(unquote(inline))
        else if (rest.nonEmpty && rest.head.indent > indent) {
          val child = rest.head.indent
          val (n, r2) =
            if (rest.head.content.startsWith("- ")) parseSequence(rest, child)
            else parseMapping(rest, child)
          rest = r2
          n
        } else Mapping(Map.empty) // `key:` with nothing nested
      require(!entries.contains(key), s"yaml line $ln: duplicate key '$key'")
      entries += key -> node
    }
    // deeper indent here means a malformed jump (e.g. after a scalar)
    require(rest.isEmpty || rest.head.indent <= indent,
      s"yaml line ${rest.head.number}: unexpected indent")
    (Mapping(entries), rest)
  }

  private def parseSequence(lines: Vector[Line], indent: Int): (Sequence, Vector[Line]) = {
    var rest = lines
    var items = List.empty[String]
    while (rest.nonEmpty && rest.head.indent == indent &&
           rest.head.content.startsWith("- ")) {
      val item = rest.head.content.drop(2).trim
      require(item.nonEmpty && !item.endsWith(":"),
        s"yaml line ${rest.head.number}: only scalar list items are supported")
      items ::= unquote(item)
      rest = rest.tail
    }
    (Sequence(items.reverse), rest)
  }

  private def indentOf(line: String, number: Int): Int = {
    val ws = line.takeWhile(c => c == ' ' || c == '\t')
    require(!ws.contains('\t'),
      s"yaml line $number: tabs are not valid YAML indentation")
    ws.length
  }

  /** Strip a trailing comment, respecting quotes. A '#' only starts a
    * comment at start-of-line or after whitespace (YAML rule). */
  private def stripComment(line: String): String = {
    var inSingle = false; var inDouble = false
    var i = 0
    // a quote only OPENS a quoted scalar at a value-start position
    // (line start / after whitespace, ':', ',', '[', '{'); a bare
    // apostrophe inside an unquoted scalar (bob's) is literal and must
    // not suppress trailing-comment stripping
    def atValueStart(j: Int): Boolean =
      j == 0 || {
        val p = line.charAt(j - 1)
        p.isWhitespace || p == ':' || p == ',' || p == '[' || p == '{'
      }
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if inSingle &&
            i + 1 < line.length && line.charAt(i + 1) == '\'' =>
          i += 1 // '' is an escaped quote inside a single-quoted scalar
        case '\'' if inSingle                       => inSingle = false
        case '\'' if !inDouble && atValueStart(i)   => inSingle = true
        case '"' if inDouble                        => inDouble = false
        case '"' if !inSingle && atValueStart(i)    => inDouble = true
        case '#' if !inSingle && !inDouble &&
            (i == 0 || line.charAt(i - 1).isWhitespace) =>
          return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'") // YAML '' escape
    else if (s.length >= 2 && s.head == '"' && s.last == '"')
      s.substring(1, s.length - 1)
    else s

  /** Typed, defaulting accessor over a parsed tree. Missing paths are
    * fine (defaults apply, matching config.go:72-89's zero-value
    * defaulting); present-but-mistyped values fail loudly. */
  final case class Cursor(node: Option[Node], path: String) {
    def /(key: String): Cursor = node match {
      case Some(Mapping(m)) => Cursor(m.get(key), s"$path.$key")
      case None             => Cursor(None, s"$path.$key")
      case Some(other) =>
        throw new IllegalArgumentException(
          s"config: $path is a ${kind(other)}, not a section")
    }
    private def scalar: Option[String] = node.map {
      case Scalar(v) => v
      case other => throw new IllegalArgumentException(
        s"config: $path is a ${kind(other)}, not a value")
    }
    def strOpt: Option[String] = scalar.filter(_.nonEmpty)
    def str(default: String): String = strOpt.getOrElse(default)
    def int(default: Int): Int = {
      val v = long(default.toLong)
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"config: $path out of int range: $v")
      v.toInt
    }
    def long(default: Long): Long = scalar match {
      case None => default
      case Some(v) =>
        try v.toLong catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"config: $path must be an integer, got '$v'") }
    }
    def bool(default: Boolean): Boolean = scalar match {
      case None          => default
      case Some("true")  => true
      case Some("false") => false
      case Some(v) => throw new IllegalArgumentException(
        s"config: $path must be true/false, got '$v'")
    }
    def list: Seq[String] = node match {
      case None               => Nil
      case Some(Sequence(it)) => it
      case Some(other) => throw new IllegalArgumentException(
        s"config: $path is a ${kind(other)}, not a list")
    }
    /** Go-style duration ("60s", "500ms", "2m", "1h") normalized to the
      * interval strings Spark's Trigger.ProcessingTime parses. */
    def duration(default: String): String =
      strOpt.map(ConfigYaml.normalizeDuration(path, _)).getOrElse(default)
    private def kind(n: Node) = n match {
      case _: Scalar => "value"; case _: Mapping => "section"
      case _: Sequence => "list"
    }
  }

  def root(m: Mapping): Cursor = Cursor(Some(m), "")

  private val DurationRe = "([0-9]+)\\s*(ms|s|m|h)".r
  def normalizeDuration(path: String, v: String): String = v.trim match {
    case DurationRe(n, unit) =>
      val name = unit match {
        case "ms" => "milliseconds"
        case "s"  => "seconds"
        case "m"  => "minutes"
        case "h"  => "hours"
      }
      s"$n $name"
    case spelled if spelled.exists(_.isLetter) && spelled.contains(' ') =>
      spelled // already a Spark interval string ("60 seconds")
    case other => throw new IllegalArgumentException(
      s"config: $path: cannot parse duration '$other'")
  }
}
