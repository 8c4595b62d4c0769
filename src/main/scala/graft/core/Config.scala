package graft.core

/** Immutable nested hyperparameter tree with `'/'`-separated path keys.
  *
  * Faithful Scala counterpart of the reference's `Config`
  * (repype/config.py:17-259): get/set/pop/setDefault/update/contains with
  * path keys, recursive deep-merge where `other` takes precedence
  * (repype/config.py:216-235), SHA-1 identity over the JSON form
  * (repype/config.py:244-247), and YAML dump. Divergences (documented in
  * SURVEY.md §7.4): immutable (the reference mutates in place and
  * auto-vivifies on `get`), and the SHA is over *canonical* sorted-key JSON
  * rather than insertion-ordered JSON — we only ever compare our own hashes.
  *
  * Values: String / Long / Double / Boolean / null / List[Any] /
  * Map[String, Any] (nested sections).
  */
final case class Config(entries: Map[String, Any] = Map.empty) {

  private def split(key: String): (Seq[String], String) = {
    val parts = key.split("/").toSeq
    (parts.init, parts.last)
  }

  /** The raw value at `path`, descending nested maps; None if unset. */
  def getOpt(path: String): Option[Any] = {
    val (dirs, last) = split(path)
    dirs.foldLeft(Option(entries: Any)) {
      case (Some(m: Map[_, _]), k) => m.asInstanceOf[Map[String, Any]].get(k)
      case _ => None
    } match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]].get(last)
      case _ => None
    }
  }

  /** Value at `path`, or `default` if unset. Nested sections come back as
    * [[Config]], mirroring repype/config.py:119-141. */
  def get(path: String, default: Any): Any = getOpt(path) match {
    case Some(m: Map[_, _]) => Config(m.asInstanceOf[Map[String, Any]])
    case Some(v) => v
    case None => default match {
      case m: Map[_, _] => Config(m.asInstanceOf[Map[String, Any]])
      case v => v
    }
  }

  def contains(path: String): Boolean = getOpt(path).isDefined

  /** Set `path` to `value`, auto-vivifying intermediate sections
    * (repype/config.py:181-214). */
  def updated(path: String, value: Any): Config =
    Config(Config.setIn(entries, path.split("/").toList, _ => Config.plain(value)))

  /** Map the value at `path` (missing → null input), like
    * `Config.update` (repype/config.py:181-198). */
  def updatedWith(path: String, f: Any => Any): Config =
    Config(Config.setIn(entries, path.split("/").toList, prev => Config.plain(f(prev.orNull))))

  /** Set `path` only if unset (or set to null when `overrideNone`)
    * (repype/config.py:97-117). */
  def setDefault(path: String, default: Any, overrideNone: Boolean = false): Config =
    getOpt(path) match {
      case Some(null) if overrideNone => updated(path, default)
      case Some(_) => this
      case None => updated(path, default)
    }

  /** Remove `path`; returns (removed value or default, new config)
    * (repype/config.py:76-94). */
  def popped(path: String, default: Any = null): (Any, Config) = getOpt(path) match {
    case Some(v) =>
      val (dirs, last) = split(path)
      def drop(m: Map[String, Any], ks: List[String]): Map[String, Any] = ks match {
        case Nil => m - last
        case k :: rest => m.get(k) match {
          case Some(sub: Map[_, _]) =>
            m.updated(k, drop(sub.asInstanceOf[Map[String, Any]], rest))
          case _ => m
        }
      }
      (v, Config(drop(entries, dirs.toList)))
    case None => (default, this)
  }

  /** Recursive deep-merge; `other` takes precedence on scalar conflicts
    * (repype/config.py:216-235). */
  def merge(other: Config): Config = Config(Config.deepMerge(entries, other.entries))

  /** SHA-1 over canonical JSON — the config identity used in staleness
    * digests (repype/config.py:244-247). */
  def sha: String = Json.sha1Of(entries)

  def yaml: String = Json.toYaml(entries)

  override def toString: String = Json.canonical(entries)
}

object Config {

  def fromYaml(text: String): Config = Config(Json.parseYaml(text))

  /** Normalize inserted values: Config → Map, Int → Long, Seq kept. */
  private[core] def plain(v: Any): Any = v match {
    case c: Config => c.entries
    case i: Int => i.toLong
    case f: Float => f.toDouble
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].map { case (k, x) => k -> plain(x) }
    case s: Seq[_] => s.map(plain)
    case other => other
  }

  private def setIn(m: Map[String, Any], path: List[String],
                    f: Option[Any] => Any): Map[String, Any] = path match {
    case last :: Nil => m.updated(last, f(m.get(last)))
    case k :: rest =>
      val sub = m.get(k) match {
        case Some(s: Map[_, _]) => s.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      m.updated(k, setIn(sub, rest, f))
    case Nil => m
  }

  private[core] def deepMerge(a: Map[String, Any], b: Map[String, Any]): Map[String, Any] =
    b.foldLeft(a) {
      case (acc, (k, bv: Map[_, _])) => acc.get(k) match {
        case Some(av: Map[_, _]) =>
          acc.updated(k, deepMerge(av.asInstanceOf[Map[String, Any]],
            bv.asInstanceOf[Map[String, Any]]))
        case _ => acc.updated(k, plain(bv))
      }
      case (acc, (k, bv)) => acc.updated(k, plain(bv))
    }
}
