package graft.dq

import scala.collection.mutable

/** Minimal YAML-subset parser for DQ job configs (zero-dependency — the
  * build resolves nothing beyond scalatest, so we parse the subset the
  * reference template actually uses: nested maps, block lists, inline
  * lists, quoted/unquoted scalars, comments).
  *
  * Shape source: reference tests/example_templates.yaml +
  * tests/orchestrate.md:221-242 (YAML → dict job config).
  */
object MiniYaml {

  def parse(text: String): Map[String, Any] = {
    val lines = text.linesIterator.toVector
      .map(stripComment)
      .zipWithIndex
      .filter { case (l, _) => l.trim.nonEmpty }
    parseBlock(lines, 0)._1 match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(s"top level must be a map, got $other")
    }
  }

  private def stripComment(line: String): String = {
    // A '#' starts a comment unless inside quotes.
    var inS = false; var inD = false
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (i < line.length && !done) {
      val c = line(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD) done = true else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

  /** Parse a block (map or list) whose items sit at indent >= `minIndent`;
    * returns (value, linesConsumed).
    */
  private def parseBlock(lines: Vector[(String, Int)], minIndent: Int): (Any, Int) = {
    if (lines.isEmpty) return (Map.empty[String, Any], 0)
    val baseIndent = indentOf(lines.head._1)
    if (baseIndent < minIndent) return (Map.empty[String, Any], 0)
    val isList = lines.head._1.trim.startsWith("- ") || lines.head._1.trim == "-"
    if (isList) parseList(lines, baseIndent) else parseMap(lines, baseIndent)
  }

  private def parseMap(lines: Vector[(String, Int)], indent: Int): (Map[String, Any], Int) = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    var i = 0
    while (i < lines.length) {
      val (line, lineNo) = lines(i)
      val ind = indentOf(line)
      if (ind < indent) return (out.toMap, i)
      require(ind == indent && !line.trim.startsWith("- "),
        s"yaml line ${lineNo + 1}: expected 'key:' at indent $indent, got: $line")
      val t = line.trim
      val colon = t.indexOf(':')
      require(colon > 0, s"yaml line ${lineNo + 1}: expected 'key: value', got: $t")
      val key = unquote(t.take(colon).trim)
      val rest = t.drop(colon + 1).trim
      if (rest.nonEmpty) {
        out(key) = scalarOrInline(rest)
        i += 1
      } else {
        val sub = lines.drop(i + 1).takeWhile { case (l, _) => indentOf(l) > indent }
        val (v, consumed) = if (sub.isEmpty) (null, 0) else parseBlock(sub, indent + 1)
        out(key) = v
        i += 1 + consumed
      }
    }
    (out.toMap, lines.length)
  }

  private def parseList(lines: Vector[(String, Int)], indent: Int): (List[Any], Int) = {
    val out = mutable.ListBuffer.empty[Any]
    var i = 0
    while (i < lines.length) {
      val (line, lineNo) = lines(i)
      val ind = indentOf(line)
      if (ind < indent) return (out.toList, i)
      require(ind == indent && (line.trim.startsWith("- ") || line.trim == "-"),
        s"yaml line ${lineNo + 1}: expected '- item' at indent $indent, got: $line")
      val rest = line.trim.drop(1).trim
      // Lines belonging to this item: following lines indented past the dash.
      val sub = lines.drop(i + 1).takeWhile { case (l, _) => indentOf(l) > indent }
      if (rest.isEmpty) {
        val (v, consumed) = parseBlock(sub, indent + 1)
        out += v
        i += 1 + consumed
      } else if (rest.contains(":") && !isQuoted(rest) && !rest.startsWith("[")) {
        // '- key: value' begins an inline map item; fold in deeper lines.
        val itemLines = (line.replaceFirst("- ", "  "), lineNo) +: sub
        val (v, _) = parseMap(itemLines, indent + 2)
        out += v
        i += 1 + sub.length
      } else {
        out += scalarOrInline(rest)
        i += 1
      }
    }
    (out.toList, lines.length)
  }

  private def isQuoted(s: String): Boolean =
    (s.startsWith("\"") && s.endsWith("\"")) || (s.startsWith("'") && s.endsWith("'"))

  private def scalarOrInline(s: String): Any =
    if (s.startsWith("[")) parseInlineList(s)
    else scalar(s)

  private def parseInlineList(s: String): List[Any] = {
    require(s.endsWith("]"), s"unterminated inline list: $s")
    val body = s.substring(1, s.length - 1).trim
    if (body.isEmpty) Nil
    else splitTopLevel(body).map(x => scalar(x.trim))
  }

  /** Split on commas not inside quotes or nested brackets. */
  private def splitTopLevel(s: String): List[String] = {
    val parts = mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inS = false; var inD = false
    s.foreach {
      case c @ '\'' if !inD => inS = !inS; cur.append(c)
      case c @ '"' if !inS => inD = !inD; cur.append(c)
      case c @ '[' if !inS && !inD => depth += 1; cur.append(c)
      case c @ ']' if !inS && !inD => depth -= 1; cur.append(c)
      case ',' if depth == 0 && !inS && !inD => parts += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toList
  }

  private def unquote(s: String): String =
    if (isQuoted(s)) s.substring(1, s.length - 1) else s

  private def scalar(s: String): Any = {
    val t = s.trim
    if (isQuoted(t)) unquote(t)
    else if (t == "null" || t == "~" || t.isEmpty) null
    else if (t == "true") java.lang.Boolean.TRUE
    else if (t == "false") java.lang.Boolean.FALSE
    else if (t.matches("[-+]?[0-9]+")) java.lang.Long.valueOf(t)
    else if (t.matches("[-+]?[0-9]*\\.[0-9]+([eE][-+]?[0-9]+)?")) java.lang.Double.valueOf(t)
    else t
  }
}
