package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.SparkSpec
import graft.model.DmsEnvelope

/** ScalaCheck properties (SURVEY §5.2 item 3): conservation, partition
  * disjointness, roundtrip. Spark-touching properties run few samples
  * (each sample is a Spark job); schema-level properties run the
  * default 100. */
object SplitProperties extends Properties("split") {

  private lazy val spark = SparkSpec.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val tables = Gen.oneOf("person", "seat", "player", "sport_team")

  private case class Env(table: String, id: Int, control: Boolean)

  private val envGen: Gen[Env] = for {
    t <- tables
    id <- Gen.chooseNum(0, 10000)
    ctl <- Gen.frequency(9 -> false, 1 -> true)
  } yield Env(t, id, ctl)

  private val dataSchema = StructType(Seq(StructField("ID", IntegerType)))
  private val schema = DmsEnvelope.envelopeSchema(dataSchema)

  private def toDf(envs: List[Env]) = spark.createDataFrame(
    spark.sparkContext.parallelize(envs.map { e =>
      Row(if (e.control) null else Row(e.id),
        Row(s"2019-11-13T09:59:${e.id % 60}.000000Z",
          if (e.control) "control" else "data", "load",
          "primary-key", "dms_sample", e.table))
    }, numSlices = 2), schema)

  property("conservation: sum of per-table splits + controls = input") =
    Prop.forAll(Gen.listOfN(30, envGen)) { envs =>
      val df = toDf(envs)
      val controls = envs.count(_.control)
      val perTable = Seq("person", "seat", "player", "sport_team")
        .map(t => StreamSplitter.demux(df, "dms_sample", t).count()).sum
      perTable + controls == envs.length
    }

  property("disjointness: demux outputs are pairwise disjoint") =
    Prop.forAll(Gen.listOfN(30, envGen)) { envs =>
      val df = toDf(envs)
      val ids = Seq("person", "seat")
        .map(t => StreamSplitter.flatten(StreamSplitter.demux(df, "dms_sample", t))
          .select("ID").collect().map(_.getInt(0)).toSeq)
      // multiset disjointness via the generated records themselves
      val expected = Seq("person", "seat")
        .map(t => envs.filter(e => !e.control && e.table == t).map(_.id).sorted)
      ids.map(_.sorted) == expected
    }

  property("roundtrip: split → parquet → read preserves rows and values") =
    Prop.forAll(Gen.listOfN(20, envGen)) { envs =>
      val df = toDf(envs)
      val dir = java.nio.file.Files.createTempDirectory("prop").toString
      StreamSplitter.splitAll(df, dir)
      val back = spark.read.parquet(dir)
      val expected = envs.filterNot(_.control)
        .map(e => (e.table, e.id)).sorted
      val got = back.select(col("table_name"), col("data.ID"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
      got == expected
    }
}

/** Schema-level properties — cheap, default sample count. */
object ChoiceProperties extends Properties("choice") {
  import ChoiceResolver._

  private val primGen: Gen[DataType] = Gen.oneOf(
    IntegerType, LongType, DoubleType, FloatType, StringType, BooleanType,
    ShortType, ByteType)

  property("widest is commutative") = Prop.forAll(primGen, primGen) { (a, b) =>
    widest(a, b) == widest(b, a)
  }

  property("widest is idempotent") = Prop.forAll(primGen) { a =>
    widest(a, a) == a
  }

  property("numeric widening never narrows") =
    Prop.forAll(primGen, primGen) { (a, b) =>
      val w = widest(a, b)
      (a, b) match {
        case (_: NumericType, _: NumericType) =>
          w.isInstanceOf[NumericType] || w == StringType
        case _ => true
      }
    }

  property("widest is associative") =
    Prop.forAll(primGen, primGen, primGen) { (a, b, c) =>
      widest(widest(a, b), c) == widest(a, widest(b, c))
    }

  /** Nested generator: structs containing structs/arrays — the shape the
    * real crawler union produces (image/image2.png). */
  private def structGen(depth: Int): Gen[StructType] = for {
    n <- Gen.chooseNum(1, 4)
    names <- Gen.pick(n, Seq("a", "b", "c", "id", "ID", "price"))
    types <- Gen.listOfN(n,
      if (depth > 0) Gen.frequency(
        4 -> primGen,
        1 -> structGen(depth - 1).map(s => s: DataType),
        1 -> primGen.map(t => ArrayType(t): DataType))
      else primGen)
  } yield StructType(names.toSeq.zip(types).map { case (nm, t) => StructField(nm, t) })

  property("mergeStructs unions field names (nested)") =
    Prop.forAll(structGen(2), structGen(2)) { (s1, s2) =>
      mergeStructs(s1, s2).fieldNames.toSet ==
        s1.fieldNames.toSet ++ s2.fieldNames.toSet
    }

  property("merge is batch-arrival-order insensitive (up to field order)") =
    Prop.forAll(structGen(2), structGen(2), structGen(2)) { (a, b, c) =>
      // arrival order permutes field ORDER (first-seen-first, like
      // unionByName) but never names or resolved types — normalize
      // order recursively before comparing
      def norm(t: DataType): DataType = t match {
        case s: StructType => StructType(
          s.fields.map(f => f.copy(dataType = norm(f.dataType), nullable = true))
            .sortBy(_.name))
        case ArrayType(e, _) => ArrayType(norm(e))
        case other => other
      }
      norm(mergeSchemas(Seq(a, b, c))) == norm(mergeSchemas(Seq(c, b, a)))
    }

  property("self-merge changes no names or types") =
    Prop.forAll(structGen(2)) { a =>
      mergeStructs(a, a).fields.map(f => (f.name, f.dataType)).toSeq ==
        a.fields.map(f => (f.name, f.dataType)).toSeq
    }
}
