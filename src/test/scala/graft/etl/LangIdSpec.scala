package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The Cavnar-Trenkle trigram classifier must actually classify when
  * the text carries a language signal (the shared documents fixture's
  * labels are content-independent, so q_lang_id can only prove
  * cross-engine parity — this spec proves quality). Training and test
  * sentences are disjoint. */
class LangIdSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("langid-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private val train = Seq(
    (0L, "en", "the quick brown fox jumps over the lazy dog and then runs through the green fields with the other animals"),
    (1L, "en", "she walks to the market every morning and buys fresh bread with butter and a little jar of honey"),
    (2L, "fr", "le renard brun saute par dessus le chien paresseux et court ensuite dans les champs verts avec les autres animaux"),
    (3L, "fr", "elle marche vers le marché chaque matin et achète du pain frais avec du beurre et un petit pot de miel"),
    (4L, "de", "der braune fuchs springt über den faulen hund und läuft dann durch die grünen felder mit den anderen tieren"),
    (5L, "de", "sie geht jeden morgen zum markt und kauft frisches brot mit butter und ein kleines glas honig"),
    (6L, "es", "el rápido zorro marrón salta sobre el perro perezoso y luego corre por los campos verdes con otros animales"),
    (7L, "es", "ella camina al mercado cada mañana y compra pan fresco con mantequilla y un pequeño frasco de miel"))

  private val test = Seq(
    (10L, "en", "a small cat sits quietly near the window watching the birds in the early morning light"),
    (11L, "fr", "un petit chat est assis tranquillement près de la fenêtre et regarde les oiseaux du matin"),
    (12L, "de", "eine kleine katze sitzt ruhig am fenster und beobachtet die vögel im frühen morgenlicht"),
    (13L, "es", "un pequeño gato se sienta en silencio junto a la ventana mirando los pájaros de la mañana"))

  test("held-out sentences classify to their language") {
    val topK = 40
    val trainDf = spark.createDataFrame(train).toDF("doc_id", "lang", "text")
    val prof = LangId.profiles(LangId.trigrams(trainDf, "text", 2048), topK)
    val testDf = spark.createDataFrame(test).toDF("doc_id", "lang", "text")
    val pred = LangId.classify(LangId.trigrams(testDf, "text", 2048), prof, topK)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    test.foreach { case (id, lang, _) =>
      assert(pred.get(id).contains(lang), s"doc $id: expected $lang got ${pred.get(id)}")
    }
  }

  test("profiles are rank-ordered, bounded, and deterministic") {
    val trainDf = spark.createDataFrame(train).toDF("doc_id", "lang", "text")
    val prof = LangId.profiles(LangId.trigrams(trainDf, "text", 2048), 40)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val byLang = prof.groupBy(_._1)
    assert(byLang.keySet == Set("en", "fr", "de", "es"))
    byLang.values.foreach { rows =>
      assert(rows.length <= 40)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // rebuilt profiles are identical (total-order tie-breaks)
    val again = LangId.profiles(LangId.trigrams(trainDf, "text", 2048), 40)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(prof.sortBy(t => (t._1, t._3)).toSeq == again.sortBy(t => (t._1, t._3)).toSeq)
  }
}
