package graft.schema

import org.apache.spark.sql.types._

/** Schema-compatibility validation — capability parity with
  * /root/reference/mf_spark/validators/schema_validator.py:101-335
  * (compare_schemas → matching / missing / mismatch report, strict mode,
  * validate_schema requirements check, infer_target_schema). Independent
  * Scala design: an immutable report case class, pattern-matching type
  * compatibility built on [[TypeMapper.promotable]], and a typed
  * [[SchemaEvolutionException]] so engine callers fail closed.
  */
object SchemaValidator {

  /** Typed failure for an incompatible mid-stream schema change. */
  final class SchemaEvolutionException(msg: String, val report: Report)
      extends RuntimeException(msg)

  /** Outcome of comparing a source schema against a target schema.
    * Mirrors the reference's report fields (schema_validator.py:40-99). */
  final case class Report(
      matching: Seq[String],
      missingInTarget: Seq[String], // in source, absent from target
      missingInSource: Seq[String], // in target, absent from source
      typeMismatches: Map[String, (DataType, DataType)], // name → (src, tgt)
      compatibleChanges: Map[String, (DataType, DataType)], // widenings
      isCompatible: Boolean) {

    def summary: String = {
      val status = if (isCompatible) "COMPATIBLE" else "INCOMPATIBLE"
      val b = new StringBuilder(s"schema comparison: $status\n")
      b ++= s"  matching: ${matching.size}\n"
      if (missingInTarget.nonEmpty)
        b ++= s"  missing in target: ${missingInTarget.mkString(", ")}\n"
      if (missingInSource.nonEmpty)
        b ++= s"  missing in source: ${missingInSource.mkString(", ")}\n"
      typeMismatches.foreach { case (f, (s, t)) =>
        b ++= s"  mismatch $f: ${s.simpleString} -> ${t.simpleString}\n"
      }
      compatibleChanges.foreach { case (f, (s, t)) =>
        b ++= s"  widened $f: ${s.simpleString} -> ${t.simpleString}\n"
      }
      b.result()
    }
  }

  final case class Options(
      allowMissingInTarget: Boolean = false,
      allowTypePromotion: Boolean = true,
      strictMode: Boolean = false)

  /** Compare `source` (incoming data) against `target` (table schema).
    * Field order is not significant; matching fields are checked for exact
    * or promotable type agreement per [[TypeMapper.promotable]]. */
  def compare(source: StructType, target: StructType,
      opts: Options = Options()): Report = {
    val srcByName = source.fields.map(f => f.name -> f).toMap
    val tgtByName = target.fields.map(f => f.name -> f).toMap
    val matching = source.fieldNames.filter(tgtByName.contains).toSeq
    val missingInTarget = source.fieldNames.filterNot(tgtByName.contains).toSeq
    val missingInSource = target.fieldNames.filterNot(srcByName.contains).toSeq

    var mismatches = Map.empty[String, (DataType, DataType)]
    var widenings = Map.empty[String, (DataType, DataType)]
    matching.foreach { name =>
      val s = srcByName(name).dataType
      val t = tgtByName(name).dataType
      if (s != t) {
        val ok = opts.allowTypePromotion && TypeMapper.promotable(s, t)
        if (ok) widenings += name -> (s, t)
        else mismatches += name -> (s, t)
      }
    }

    val compatible = mismatches.isEmpty &&
      (opts.allowMissingInTarget || missingInTarget.isEmpty) &&
      !(opts.strictMode && widenings.nonEmpty)
    Report(matching, missingInTarget, missingInSource, mismatches, widenings,
      compatible)
  }

  /** Require compatibility; throws the typed error with the full report
    * (the engine's fail-closed evolution gate). */
  def requireCompatible(source: StructType, target: StructType,
      opts: Options = Options()): Report = {
    val r = compare(source, target, opts)
    if (!r.isCompatible)
      throw new SchemaEvolutionException(
        s"incompatible schema change\n${r.summary}", r)
    r
  }

  /** Validate a schema against requirements (schema_validator.py:256-299):
    * required field names plus optional expected Spark types. */
  def validate(schema: StructType, requiredFields: Seq[String] = Seq.empty,
      fieldTypes: Map[String, DataType] = Map.empty): (Boolean, Seq[String]) = {
    val byName = schema.fields.map(f => f.name -> f).toMap
    val missing = requiredFields.filterNot(byName.contains)
      .map(f => s"required field missing: $f")
    val wrongTypes = fieldTypes.toSeq.flatMap { case (name, expected) =>
      byName.get(name).collect {
        case f if f.dataType != expected =>
          s"type mismatch for $name: expected ${expected.simpleString}, got ${f.dataType.simpleString}"
      }
    }
    val errors = missing ++ wrongTypes
    (errors.isEmpty, errors)
  }

  /** Derive a target schema from a source schema with optional per-field
    * renames and type overrides (schema_validator.py:301-335). */
  def inferTargetSchema(source: StructType,
      typeMappings: Map[String, DataType] = Map.empty,
      columnMappings: Map[String, String] = Map.empty): StructType =
    StructType(source.fields.map { f =>
      StructField(
        columnMappings.getOrElse(f.name, f.name),
        typeMappings.getOrElse(f.name, f.dataType),
        f.nullable)
    })
}
