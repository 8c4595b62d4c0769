package graft.core

import java.security.MessageDigest

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** JSON/YAML (de)serialization for config trees and task specs, plus the
  * canonical-JSON SHA-1 used for staleness digests.
  *
  * Values round-trip as plain Scala: Map[String, Any], List[Any], String,
  * Long, Double, Boolean, null. Reference anchor: repype hashes configs via
  * `json.dumps` (repype/config.py:244-247) and loads specs via
  * `yaml.safe_load` (repype/task.py:307); we canonicalize with sorted keys
  * (SURVEY.md §7.4 risk 1 — divergence documented there).
  */
object Json {

  private val json = new ObjectMapper()
  private val yaml = new ObjectMapper(new YAMLFactory())

  /** jackson tree -> plain Scala values (ints widened to Long). */
  private def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> fromJava(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(fromJava).toList
    case i: java.lang.Integer => i.longValue()
    case i: java.math.BigInteger => i.longValue()
    case f: java.lang.Float => f.doubleValue()
    case d: java.math.BigDecimal => d.doubleValue()
    case other => other
  }

  private def toJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => out.put(k.toString, toJava(x)) }
      out
    case s: Seq[_] =>
      val out = new java.util.ArrayList[Any]()
      s.foreach(x => out.add(toJava(x)))
      out
    case other => other
  }

  def parseYaml(text: String): Map[String, Any] =
    Option(yaml.readValue(text, classOf[java.util.Map[String, Any]]))
      .map(m => fromJava(m).asInstanceOf[Map[String, Any]])
      .getOrElse(Map.empty)

  def parseJson(text: String): Map[String, Any] =
    fromJava(json.readValue(text, classOf[java.util.Map[String, Any]]))
      .asInstanceOf[Map[String, Any]]

  def toYaml(value: Map[String, Any]): String =
    yaml.writeValueAsString(toJava(value))

  /** Canonical JSON: object keys sorted, no whitespace — stable across runs
    * and JVMs, so SHA-1 digests of it are valid staleness identities. */
  def canonical(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => quote(k) + ":" + canonical(x) }
        .mkString("{", ",", "}")
    case s: Seq[_] => s.map(canonical).mkString("[", ",", "]")
    case s: String => quote(s)
    case b: Boolean => b.toString
    case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
      d.toLong.toString else d.toString
    case other => other.toString
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def sha1(text: String): String =
    MessageDigest.getInstance("SHA-1").digest(text.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  def sha1Of(value: Any): String = sha1(canonical(value))
}
