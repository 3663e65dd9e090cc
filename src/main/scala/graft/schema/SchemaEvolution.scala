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
    * `schema_evolution.py:141-172`). A type "change" on a nested type is
    * judged by [[mergeType]]'s rules — structs evolve field-wise with
    * the same sparse/add/promote semantics as top-level columns. */
  def validate(diff: SchemaDiff): Unit = {
    val errors = diff.typeChanges.flatMap { case (name, oldT, newT) =>
      try { mergeType(name, oldT, newT); None }
      catch { case e: SchemaEvolutionError => Some(e.getMessage) }
    }
    if (errors.nonEmpty)
      throw new SchemaEvolutionError(
        "Schema evolution validation failed:\n" + errors.map("  - " + _).mkString("\n"))
  }

  /** Evolved type of a column whose incoming type differs: scalars only
    * safe-promote; structs MERGE field-wise (`schema_casting.py:63-69`
    * recurses the same way) — existing fields keep their slot (with
    * nested promotion), incoming-missing nullable fields stay as sparse
    * null-fill, incoming-missing required fields are an error, and
    * incoming-only fields are appended nullable. Arrays and maps merge
    * element-/value-wise. */
  def mergeType(path: String, oldT: DataType, newT: DataType): DataType =
    (oldT, newT) match {
      case (o, n) if o == n => o
      case (o: StructType, n: StructType) =>
        val nByName = n.fields.map(f => f.name -> f).toMap
        val oldNames = o.fields.map(_.name).toSet
        val kept = o.fields.toSeq.map { of =>
          nByName.get(of.name) match {
            case Some(nf) =>
              of.copy(dataType =
                mergeType(s"$path.${of.name}", of.dataType, nf.dataType))
            case None if of.nullable => of // nested sparse: null-fill
            case None => throw new SchemaEvolutionError(
              s"Incoming data is missing required nested field '$path.${of.name}'")
          }
        }
        val added = n.fields.toSeq
          .filterNot(f => oldNames.contains(f.name))
          .map(_.copy(nullable = true))
        StructType(kept ++ added)
      case (ArrayType(oe, n1), ArrayType(ne, _)) =>
        ArrayType(mergeType(s"$path[]", oe, ne), n1)
      case (MapType(ok, ov, n1), MapType(nk, nv, _)) if ok == nk =>
        MapType(ok, mergeType(s"$path{}", ov, nv), n1)
      case (o, n) if TypeLattice.canPromote(o, n) => n
      case (o, n) => throw new SchemaEvolutionError(
        s"Unsafe type change for column '$path': ${o.simpleString} -> " +
          s"${n.simpleString}. Only safe promotions are allowed " +
          "(int->long, float->double, decimal widening, struct field adds).")
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

    val promotions = diff.typeChanges
      .map { case (n, o, t) => n -> mergeType(n, o, t) }.toMap
    val droppedSet = if (allowColumnDrops) diff.dropped.toSet else Set.empty[String]
    val kept = existing.fields.toSeq
      .filterNot(f => droppedSet.contains(f.name))
      .map(f => promotions.get(f.name).fold(f)(t => f.copy(dataType = t)))
    val next = StructType(kept ++ diff.added)
    // a struct "change" that merges back to the existing type (e.g. a
    // nested-sparse batch) is not an evolution
    EvolutionResult(next, evolved = next != existing)
  }
}
