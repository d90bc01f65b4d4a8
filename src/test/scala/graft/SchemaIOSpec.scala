package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{SchemaIO, Settings}

/** Port of the reference's schema.py / settings.py contract: YAML schema
  * round-trip in the field_as_dict shape, walk-up settings discovery. */
class SchemaIOSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("@id", StringType),
    StructField("year", ShortType),
    StructField("score", FloatType),
    StructField("defended", DateType),
    StructField("keywords", ArrayType(StringType)),
    StructField("counts", ArrayType(LongType))))

  test("schema round-trips through the reference's YAML shape") {
    val yaml = SchemaIO.toYaml(schema)
    // the reference's exact per-field keys (schema.py field_as_dict)
    assert(yaml.contains("keywords:\n  list: true\n  arrow_type: string"))
    assert(yaml.contains("year:\n  list: false\n  arrow_type: int16"))
    val back = SchemaIO.fromYaml(yaml)
    assert(back == StructType(schema.fields.map(_.copy(nullable = true))))
  }

  test("schema file save/load") {
    val f = Files.createTempFile("schema", ".yaml")
    SchemaIO.save(schema, f.toString)
    assert(SchemaIO.load(f.toString).fieldNames.toSeq == schema.fieldNames.toSeq)
  }

  test("yaml subset parser: comments, quotes, blank lines") {
    val parsed = SchemaIO.fromYaml(
      """# a comment
        |title:
        |  list: false
        |  arrow_type: "string"   # quoted + trailing comment
        |
        |tags:
        |  list: true
        |  arrow_type: 'string'
        |""".stripMargin)
    assert(parsed("title").dataType == StringType)
    assert(parsed("tags").dataType == ArrayType(StringType))
    // the full-line comment must NOT appear as a phantom field
    assert(parsed.fields.length == 2, parsed.fieldNames.mkString(","))
  }

  test("settings: nearest .nonconsumptive.yaml wins, values coerced") {
    val root = Files.createTempDirectory("nc_settings")
    val nested = root.resolve("a/b")
    Files.createDirectories(nested)
    Files.writeString(root.resolve(Settings.FileName),
      """cache: /tmp/cache
        |workers: 8
        |threshold: 0.75
        |verbose: true
        |""".stripMargin)
    val s = Settings.load(nested.toString)
    assert(s("cache") == "/tmp/cache")
    assert(s("workers") == 8L)
    assert(s("threshold") == 0.75)
    assert(s("verbose") == true)
    // a closer file shadows the ancestor entirely (nearest-wins)
    Files.writeString(nested.resolve(Settings.FileName), "workers: 2\n")
    assert(Settings.load(nested.toString) == Map("workers" -> 2L))
  }

  test("settings: no file anywhere yields empty map, not an error") {
    val lonely = Files.createTempDirectory("nc_nosettings")
    assert(Settings.load(lonely.toString).isEmpty ||
      !Settings.load(lonely.toString).contains("workers"))
  }
}
