package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Verbatim port of the reference's end-to-end example
  * (reference: core/examples/music.rs) — the richest typed surface it
  * exercises: struct tuples with Option and array fields, enum arrays,
  * Option-valued computed join keys, sum-type (Either) columns, views
  * created mid-stream and maintained incrementally. Same data, same
  * queries, same asserted sorted results.
  */
class MusicExampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Expr._
  import MusicExampleSpec._

  test("music example end-to-end (music.rs:33-227)") {
    val db = new CoddSession(spark)
    val musician = db.addRelation[Musician]("musician")
    val band = db.addRelation[Band]("band")
    val song = db.addRelation[Song]("song")

    db.insert(musician, Seq(
      Musician("John Petrucci", Some("Dream Theater"), Seq("Guitar")),
      Musician("Taylor Swift", None, Seq("Vocals")),
      Musician("Conor Mason", Some("Nothing But Thieves"), Seq("Vocals", "Guitar")),
      Musician("Stevie Wonder", None, Seq("Vocals", "Piano")),
      Musician("Jordan Rudess", Some("Dream Theater"), Seq("Keyboard")),
      Musician("Alex Turner", Some("Arctic Monkeys"), Seq("Vocals", "Guitar", "Piano")),
      Musician("Billie Eilish", None, Seq("Vocals", "Piano")),
      Musician("Lars Ulrich", Some("Metallica"), Seq("Drums"))))

    db.insert(band, Seq(
      Band("Dream Theater", "Progressive Metal"),
      Band("Nothing But Thieves", "Alternative Rock"),
      Band("Metallica", "Heavy Metal"),
      Band("Arctic Monkeys", "Indie Rock")))

    db.insert(song, Seq(
      Song("pull me under", Artist.band("Dream Theater")),
      Song("bad guy", Artist.musician("Billie Eilish")),
      Song("excuse me", Artist.musician("Nothing But Thieves")),
      Song("enter sandman", Artist.band("Metallica")),
      Song("panic attack", Artist.band("Dream Theater")),
      Song("shake it off", Artist.musician("Taylor Swift")),
      Song("r u mine", Artist.band("Artcic Monkeys")),
      Song("as I am", Artist.band("Dream Theater"))))

    // guitarists (music.rs:148-161)
    val guitaristName = musician
      .select(_.instruments.contains("Guitar"))
      .project(_.name)
    assert(db.evaluateSorted(guitaristName) ==
      Seq("Alex Turner", "Conor Mason", "John Petrucci"))

    // Dream Theater members via Option-keyed join (music.rs:163-175)
    val dtMember = musician
      .withKey(_.band)
      .join(band.withKey(b => Option(b.name)))
      .on((_, m, b) => (m.name, b.name))
      .select(_._2 == "Dream Theater")
      .project(_._1)
    assert(db.evaluateSorted(dtMember) == Seq("John Petrucci", "Jordan Rudess"))

    // views created mid-stream (music.rs:177-186)
    val dtMemberView = db.storeView(dtMember)
    val drummerView = db.storeView(musician.select(_.instruments.contains("Drums")))

    db.insert(musician, Seq(
      Musician("John Myung", Some("Dream Theater"), Seq("Guitar")),
      Musician("Mike Mangini", Some("Dream Theater"), Seq("Drums"))))

    // incremental maintenance (music.rs:202-225)
    assert(db.evaluateSorted(drummerView)(Ordering.by((m: Musician) => m.name)) == Seq(
      Musician("Lars Ulrich", Some("Metallica"), Seq("Drums")),
      Musician("Mike Mangini", Some("Dream Theater"), Seq("Drums"))))
    assert(db.evaluateSorted(dtMemberView) ==
      Seq("John Myung", "John Petrucci", "Jordan Rudess", "Mike Mangini"))

    // bonus: the sum-type column round-trips; songs by bands vs solo artists
    val bandSongs = song.select(_.artist.band.isDefined).project(_.title)
    assert(db.evaluateSorted(bandSongs) ==
      Seq("as I am", "enter sandman", "panic attack", "pull me under", "r u mine"))
  }
}

object MusicExampleSpec {
  // Instrument enum → String (the reference's 5-variant fieldless enum;
  // FIXTURES.md A suggests enumeration-encoder-or-String)
  final case class Musician(name: String, band: Option[String], instruments: Seq[String])
  final case class Band(name: String, genre: String)

  /** Either<musician, band> as a 2-variant tagged struct (FIXTURES.md A). */
  final case class Artist(musician: Option[String], band: Option[String])
  object Artist {
    def musician(name: String): Artist = Artist(Some(name), None)
    def band(name: String): Artist = Artist(None, Some(name))
  }
  final case class Song(title: String, artist: Artist)
}
