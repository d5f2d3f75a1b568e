package graft.schema

import org.apache.spark.sql.types._

/** Core data model of the CDC / incremental-ingest engine.
  *
  * The base table shape (repo, path, commit, lang, content) is fixed by the
  * target contract (BASELINE.json `input_hint`); the change-event envelope
  * adds (lsn, op, ts). This mirrors the reference pipeline's universal
  * record pattern (reference: src/places/mod.rs:13-22 — one fixed,
  * code-defined record for every stage) re-expressed as Catalyst-encoded
  * case classes.
  */
final case class RepoFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** One ordered change event in the binlog/WAL-style log.
  *
  * - `lsn`  — globally unique, strictly ordered log sequence number; the
  *   dedup key (reference analogue: one-edit-per-osm_id dedup,
  *   src/pipeline/edits.rs:179-186).
  * - `op`   — "I" insert / "U" update / "D" delete.
  * - `ts`   — event time; watermark column for streaming dedup.
  * - content is null for deletes.
  */
final case class ChangeEvent(
    lsn: Long,
    op: String,
    ts: java.sql.Timestamp,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** Versioned schema registry with explicit evolution rules.
  *
  * The reference's schema-evolution story is a reader that tolerates absent
  * optional columns (src/places/place_index.rs:359-370). We generalize:
  * a new schema version may ADD nullable columns or WIDEN integral types;
  * anything else is rejected. The lake snapshot records the schema version
  * so old data files (missing new columns) remain readable — Spark fills
  * missing parquet columns with null when reading with the merged schema.
  */
object SchemaRegistry {

  /** Schema v1: the base change-event envelope. */
  val eventSchemaV1: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("content", StringType, nullable = true)
  ))

  /** Schema v2: adds a nullable `branch` column (evolution fixture). */
  val eventSchemaV2: StructType =
    eventSchemaV1.add(StructField("branch", StringType, nullable = true))

  /** Columns of the materialized table state (per (repo, path) key). */
  def stateSchema(eventSchema: StructType): StructType = StructType(
    eventSchema.fields.filterNot(f => f.name == "op")
  )

  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    // an all-null column (JSON inference — or an all-poison batch — yields
    // NullType) carries no type information: any concrete type covers it
    case (NullType, _) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Resolve NullType (all-null) columns at TABLE CREATION, where there is
    * no current schema to inherit a type from: fall back to the canonical
    * event schema's type when the column name is known there, and drop the
    * column otherwise (all its values are null — nothing is lost, and the
    * column joins the table properly typed the first time a producer sends
    * a real value). Without this, one all-null inferred column would bake
    * `void` into the table schema forever. */
  def resolveNullTypes(schema: StructType, fallback: StructType = eventSchemaV1): StructType = {
    val fb = fallback.fields.map(f => f.name -> f.dataType).toMap
    StructType(schema.fields.flatMap { f =>
      if (f.dataType != NullType) Some(f)
      else fb.get(f.name).map(t => StructField(f.name, t, nullable = true))
    })
  }

  /** Evolve `current` to also cover `incoming`.
    *
    * The table schema only grows: columns present in both must be equal or
    * widen legally; columns only in `incoming` are appended (and must be
    * nullable — old rows have no value for them); columns only in
    * `current` stay (old producers may still emit the narrower schema —
    * their rows get nulls). Anything else throws.
    */
  def evolve(current: StructType, incoming: StructType): StructType = {
    val curByName = current.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { inF =>
      curByName.get(inF.name).foreach { curF =>
        require(widens(curF.dataType, inF.dataType) || widens(inF.dataType, curF.dataType),
          s"illegal schema evolution for column ${inF.name}: " +
            s"${curF.dataType.simpleString} -> ${inF.dataType.simpleString}")
      }
    }
    // merged = current columns (possibly widened) ++ new nullable columns
    val mergedExisting = current.fields.map { curF =>
      incoming.fields.find(_.name == curF.name) match {
        case Some(inF) if widens(curF.dataType, inF.dataType) && curF.dataType != inF.dataType =>
          curF.copy(dataType = inF.dataType)
        case _ => curF
      }
    }
    // a column name, once used, is reserved forever: after RENAME a TO b,
    // an arriving batch still carrying "a" must refuse loudly — treating
    // it as a brand-new column would fork one logical column into two,
    // and the alias-era reader (FieldIds) relies on at most one of a
    // field's names existing per file
    val formerNames = current.fields.flatMap(f =>
      FieldIds.aliases(f).map(_ -> f.name)).toMap
    val added = incoming.fields.filterNot(f => curByName.contains(f.name))
      // a NEW all-null column carries no type to store — it joins the
      // schema properly typed once a producer sends a real value
      .filterNot(_.dataType == NullType)
      .map { f =>
        formerNames.get(f.name).foreach { now =>
          throw new IllegalArgumentException(
            s"column ${f.name} was renamed to $now; producers must send the new name")
        }
        require(f.nullable, s"new column ${f.name} must be nullable")
        f
      }
    StructType(mergedExisting ++ added)
  }
}
