package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The framing claim is that [[TarShards]] writes REAL POSIX tar — so the
  * decisive check is the system `tar` binary, not our own parser.
  */
class TarShardsSpec extends AnyFunSuite {

  private val entries = Seq(
    "3.txt" -> "hello tar".getBytes("UTF-8"),
    "7.txt" -> Array.fill[Byte](512)(42), // exactly one block
    "11.txt" -> Array.emptyByteArray, // zero-byte member
    "13.txt" -> Array.fill[Byte](513)(7), // one byte over a block
    "20.txt" -> ("x" * 511).getBytes("UTF-8"))

  test("parse round-trips names, sizes, and block-walk offsets") {
    val bytes = TarShards.shardBytes(entries)
    val manifest = TarShards.parse(bytes)
    assert(manifest.map(_._1) == entries.map(_._1))
    assert(manifest.map(_._2) == entries.map(_._2.length.toLong))
    // offsets replay the closed-form 512-block walk
    val expected = entries
      .map { case (_, b) => 512L + (b.length + 511L) / 512 * 512 }
      .scanLeft(0L)(_ + _)
      .init
    assert(manifest.map(_._3) == expected)
    // trailer: exactly two zero blocks after the last entry
    val tail = expected.last + 512 + (entries.last._2.length + 511L) / 512 * 512
    assert(bytes.length == tail + 1024)
    assert(bytes.drop(tail.toInt).forall(_ == 0))
  }

  test("system tar lists and extracts the archive byte-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("tarshard")
    val tarPath = dir.resolve("shard.tar")
    java.nio.file.Files.write(tarPath, TarShards.shardBytes(entries))

    val list = new ProcessBuilder("tar", "-tf", tarPath.toString).start()
    val names = scala.io.Source.fromInputStream(list.getInputStream).getLines().toList
    assert(list.waitFor() == 0, "tar -tf exit status")
    assert(names == entries.map(_._1).toList)

    val extractDir = dir.resolve("out")
    java.nio.file.Files.createDirectory(extractDir)
    val extract = new ProcessBuilder(
      "tar",
      "-xf",
      tarPath.toString,
      "-C",
      extractDir.toString).inheritIO().start()
    assert(extract.waitFor() == 0, "tar -xf exit status")
    entries.foreach { case (name, bytes) =>
      val got = java.nio.file.Files.readAllBytes(extractDir.resolve(name))
      assert(got.sameElements(bytes), s"payload mismatch for $name")
    }
  }

  test("parse accepts what system tar writes (reader interop)") {
    val dir = java.nio.file.Files.createTempDirectory("tarinterop")
    entries.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    val tarPath = dir.resolve("sys.tar")
    // ustar format, fixed member order, no metadata noise
    val mk = new ProcessBuilder(
      ("tar" :: "--format=ustar" :: "-cf" :: tarPath.toString :: "-C" :: dir.toString ::
        entries.map(_._1).toList): _*).inheritIO().start()
    assert(mk.waitFor() == 0, "tar -cf exit status")
    val manifest = TarShards.parse(java.nio.file.Files.readAllBytes(tarPath))
    assert(manifest.map(_._1) == entries.map(_._1))
    assert(manifest.map(_._2) == entries.map(_._2.length.toLong))
  }
}
