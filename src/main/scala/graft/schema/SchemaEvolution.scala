package graft.schema

import org.apache.spark.sql.types._
import graft.types.TypeLattice

/** Raised when an unsafe schema change is detected
  * (`schema_evolution.py:35-37`). */
class SchemaEvolutionError(msg: String) extends RuntimeException(msg)

/** Schema diff + evolution decision tree (`schema_evolution.py:90-305`),
  * re-expressed as pure functions over `StructType`. The catalog layer owns
  * applying the evolved schema to table metadata transactionally; this
  * module only decides.
  *
  * Semantics pinned by the reference's tests (`test_sparse_schema.py`,
  * `test_schema_evolution.py`):
  *  - added fields ⇒ add to schema
  *  - type change ⇒ only safe promotions (int→long, float→double, decimal
  *    widening), else SchemaEvolutionError
  *  - dropped & required & !allowColumnDrops ⇒ SchemaEvolutionError
  *  - dropped & nullable & !allowColumnDrops ⇒ "sparse": keep the column,
  *    incoming rows null-fill, schema unchanged (and if that's the ONLY
  *    change, no evolution happens at all)
  *  - dropped & allowColumnDrops ⇒ column removed from schema
  */
object SchemaEvolution {

  final case class SchemaDiff(
      added: Seq[StructField],
      typeChanges: Seq[(String, DataType, DataType)],
      dropped: Seq[String])

  final case class EvolutionResult(schema: StructType, evolved: Boolean)

  /** Field-by-field diff by name (`compare_schemas`,
    * `schema_evolution.py:90-138`). Preserves existing-schema field order
    * for stability (the reference relies on dict ordering). */
  def compare(existing: StructType, incoming: StructType): SchemaDiff = {
    val existingByName = existing.fields.map(f => f.name -> f).toMap
    val incomingByName = incoming.fields.map(f => f.name -> f).toMap

    val added = incoming.fields.toSeq.filterNot(f => existingByName.contains(f.name))
    val dropped = existing.fields.toSeq.map(_.name).filterNot(incomingByName.contains)
    val typeChanges = existing.fields.toSeq.flatMap { ef =>
      incomingByName.get(ef.name).collect {
        case nf if nf.dataType != ef.dataType => (ef.name, ef.dataType, nf.dataType)
      }
    }
    SchemaDiff(added, typeChanges, dropped)
  }

  /** Unsafe-change validation (`validate_schema_changes`,
    * `schema_evolution.py:141-172`). */
  def validate(diff: SchemaDiff): Unit = {
    val errors = diff.typeChanges.collect {
      case (name, oldT, newT) if !TypeLattice.canPromote(oldT, newT) =>
        s"Unsafe type change for column '$name': ${oldT.simpleString} -> " +
          s"${newT.simpleString}. Only safe promotions are allowed " +
          "(int->long, float->double, decimal widening)."
    }
    if (errors.nonEmpty)
      throw new SchemaEvolutionError(
        "Schema evolution validation failed:\n" + errors.map("  - " + _).mkString("\n"))
  }

  private def requiredDropped(existing: StructType, dropped: Seq[String]): Seq[String] = {
    val droppedSet = dropped.toSet
    existing.fields.toSeq.collect {
      case f if droppedSet.contains(f.name) && !f.nullable => f.name
    }
  }

  /** The main entry point (`evolve_schema_if_needed`,
    * `schema_evolution.py:228-305`): returns the evolved schema and whether
    * evolution occurred. */
  def evolve(
      existing: StructType,
      incoming: StructType,
      allowColumnDrops: Boolean = false): EvolutionResult = {
    val diff = compare(existing, incoming)

    if (diff.added.isEmpty && diff.typeChanges.isEmpty && diff.dropped.isEmpty)
      return EvolutionResult(existing, evolved = false)

    val missingRequired =
      if (!allowColumnDrops) requiredDropped(existing, diff.dropped) else Nil
    if (missingRequired.nonEmpty)
      throw new SchemaEvolutionError(
        "Incoming data is missing required existing columns and cannot be " +
          "treated as sparse data: " + missingRequired.mkString(", "))

    validate(diff)

    // drop-only change without allow_column_drops: sparse data, schema is
    // already correct (schema_evolution.py:296-297)
    if (!allowColumnDrops && diff.added.isEmpty && diff.typeChanges.isEmpty)
      return EvolutionResult(existing, evolved = false)

    val promotions = diff.typeChanges.map { case (n, _, t) => n -> t }.toMap
    val droppedSet = if (allowColumnDrops) diff.dropped.toSet else Set.empty[String]
    val kept = existing.fields.toSeq
      .filterNot(f => droppedSet.contains(f.name))
      .map(f => promotions.get(f.name).fold(f)(t => f.copy(dataType = t)))
    EvolutionResult(StructType(kept ++ diff.added), evolved = true)
  }
}
