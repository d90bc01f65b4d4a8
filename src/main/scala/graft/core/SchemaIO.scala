package graft.core

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.types._

/** Schema serialization and project settings — the reference's
  * `schema.py` (NC_Schema: a YAML map of column -> {list, arrow_type, role,
  * dictionary}) and `settings.py` (walk-up loader for
  * `.nonconsumptive.yaml`), re-expressed for Spark `StructType`.
  *
  * The on-disk format is the reference's exact two-level YAML shape
  * (schema.py field_as_dict), emitted and parsed by a minimal YAML-subset
  * codec (block maps, scalar leaves) — no external YAML dependency exists in
  * this build, and the reference never uses more of YAML than this subset.
  */
object SchemaIO {

  /** Spark type -> arrow type name (schema.py field_as_string, extended past
    * the reference's {string, int64, int32} to the rest of the cast
    * ladder's output types). */
  def arrowName(dt: DataType): String = dt match {
    case StringType => "string"
    case LongType => "int64"
    case IntegerType => "int32"
    case ShortType => "int16"
    case ByteType => "int8"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date32"
    case BooleanType => "bool"
    case BinaryType => "binary"
    case TimestampType => "timestamp"
    case other =>
      throw new IllegalArgumentException(s"unsupported schema type $other")
  }

  def sparkType(arrow: String): DataType = arrow match {
    case "string" => StringType
    case "int64" => LongType
    case "int32" => IntegerType
    case "int16" => ShortType
    case "int8" => ByteType
    case "float" => FloatType
    case "double" => DoubleType
    case "date32" => DateType
    case "bool" => BooleanType
    case "binary" => BinaryType
    case "timestamp" => TimestampType
    case other =>
      throw new IllegalArgumentException(s"unsupported arrow type $other")
  }

  /** Serialize a StructType in the reference's field_as_dict YAML shape. */
  def toYaml(schema: StructType): String = {
    val sb = new StringBuilder
    schema.fields.foreach { f =>
      val (isList, elem) = f.dataType match {
        case ArrayType(e, _) => (true, e)
        case dt => (false, dt)
      }
      sb.append(s"${f.name}:\n")
      sb.append(s"  list: $isList\n")
      sb.append(s"  arrow_type: ${arrowName(elem)}\n")
      sb.append(s"  role: null\n")
      sb.append(s"  dictionary: false\n")
    }
    sb.toString
  }

  /** Parse the field_as_dict YAML shape back to a StructType (all fields
    * nullable, like JSON/parquet-inferred schemas). */
  def fromYaml(yaml: String): StructType = {
    val entries = parseBlockMap(yaml)
    StructType(entries.map { case (name, attrs) =>
      val base = sparkType(attrs.getOrElse("arrow_type", "string"))
      val dt =
        if (attrs.get("list").contains("true")) ArrayType(base) else base
      StructField(name, dt, nullable = true)
    })
  }

  def save(schema: StructType, path: String): Unit =
    Files.writeString(Paths.get(path), toYaml(schema))

  def load(path: String): StructType =
    fromYaml(Files.readString(Paths.get(path)))

  /** Two-level YAML-subset block map: `key:` lines at indent 0, `  k: v`
    * leaves at indent 2. Comments and blank lines skipped. Preserves key
    * order. */
  private[core] def parseBlockMap(text: String): Seq[(String, Map[String, String])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, scala.collection.mutable.Map[String, String])]
    text.linesIterator.foreach { line =>
      val noComment = line.replaceAll("\\s+#.*$", "")
      // full-line comments must not become keys (the strip above only
      // removes trailing comments preceded by whitespace)
      if (noComment.trim.nonEmpty && !noComment.trim.startsWith("#")) {
        if (!noComment.startsWith(" ")) {
          val key = noComment.stripSuffix(":").trim
          out += key -> scala.collection.mutable.Map.empty[String, String]
        } else {
          require(out.nonEmpty, s"indented line before any key: $line")
          val Array(k, v) = noComment.trim.split(":", 2).map(_.trim)
          out.last._2 += k -> stripQuotes(v)
        }
      }
    }
    out.toSeq.map { case (k, m) => k -> m.toMap }
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v
}

/** Project settings: flat key/value YAML in `.nonconsumptive.yaml`, found by
  * walking UP from the given directory (settings.py:1-22 — with the
  * reference's bug fixed: it tested `dir.exists()` instead of the yaml
  * file's existence, so it crashed on any project without one at the top).
  */
object Settings {

  val FileName = ".nonconsumptive.yaml"

  /** Parse scalar values like YAML would: bool / long / double / string. */
  def coerce(v: String): Any = v match {
    case "true" => true
    case "false" => false
    case "null" | "~" => null
    case s if s.matches("-?[0-9]+") => s.toLong
    case s if s.matches("-?[0-9]*\\.[0-9]+([eE]-?[0-9]+)?") => s.toDouble
    case s => s
  }

  /** Load the nearest settings file at or above `dir`; empty when none. */
  def load(dir: String): Map[String, Any] = {
    var p: Path = Paths.get(dir).toAbsolutePath
    while (p != null) {
      val f = p.resolve(FileName)
      if (Files.exists(f)) return parse(Files.readString(f))
      p = p.getParent
    }
    Map.empty
  }

  private[core] def parse(text: String): Map[String, Any] =
    text.linesIterator
      .map(_.replaceAll("\\s+#.*$", ""))
      .filter(l => l.trim.nonEmpty && !l.startsWith("#") && l.contains(":"))
      .map { l =>
        val Array(k, v) = l.split(":", 2).map(_.trim)
        k -> coerce(v)
      }.toMap
}
