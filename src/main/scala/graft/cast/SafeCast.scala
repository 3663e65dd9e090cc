package graft.cast

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Safe cast execution (`cast_table_safe`, `schema_casting.py:414-490`):
  * validate → fail on missing required columns (even non-strict) → fail on
  * loss in strict mode → null-fill sparse columns → reorder to target
  * order → cast.
  *
  * Distributed by construction: the whole thing is one `df.select` of cast
  * expressions, so it stays inside whole-stage codegen — no row-at-a-time
  * work, no driver materialization, unlike the reference's in-memory
  * `table.cast` which holds the full batch in RAM.
  */
object SafeCast {

  def apply(df: DataFrame, target: StructType, strict: Boolean = true): DataFrame = {
    val source = df.schema
    val validation = CastValidator.validateCast(source, target)

    val missingRequired = CastValidator.missingRequiredTargetFields(source, target)
    if (missingRequired.nonEmpty)
      throw new CastingError(
        "Cannot cast table with missing required target fields:\n" +
          missingRequired.map(f =>
            s"Required field '${f.name}' exists in target but not in source schema")
            .mkString("\n"))

    if (strict && !validation.isSafe) {
      val msg = new StringBuilder("Cannot cast table safely. Errors:\n")
      msg ++= validation.errors.mkString("\n")
      if (validation.warnings.nonEmpty)
        msg ++= "\nWarnings:\n" + validation.warnings.mkString("\n")
      throw new CastingError(msg.toString)
    }

    val sourceNames = source.fieldNames.toSet
    val projected = target.fields.toSeq.map { tf =>
      if (sourceNames.contains(tf.name))
        col(tf.name).cast(tf.dataType).as(tf.name)
      else
        // sparse incoming batch: null-fill target-only nullable columns
        // (schema_casting.py:469-477)
        lit(null).cast(tf.dataType).as(tf.name)
    }
    df.select(projected: _*)
  }
}
