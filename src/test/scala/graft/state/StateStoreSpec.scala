package graft.state

import graft.SparkSpec
import java.nio.file.Files

class StateStoreSpec extends SparkSpec {

  private def newStore(dir: java.nio.file.Path) =
    new StateStore(dir.resolve("t1/csv.obj.state.json").toString, spark)

  test("state round-trips through the Hadoop FS as JSON") {
    val store = newStore(Files.createTempDirectory("state-"))
    store.read() shouldBe Map.empty
    store.write(Map("file_a" -> Map("last_modified" -> "2024-01-01T00:00:00Z",
      "file_id" -> "a")))
    store.read()("file_a")("last_modified") shouldBe "2024-01-01T00:00:00Z"
  }

  test("file skip: unchanged mtime skips, newer processes, lookback disables") {
    val store = newStore(Files.createTempDirectory("state-"))
    store.shouldSkipFile("f1", "2024-01-02T00:00:00Z") shouldBe false // no state
    store.updateFileState("f1", "2024-01-02T00:00:00Z")
    store.shouldSkipFile("f1", "2024-01-02T00:00:00Z") shouldBe true  // unchanged
    store.shouldSkipFile("f1", "2024-01-01T00:00:00Z") shouldBe true  // older
    store.shouldSkipFile("f1", "2024-01-03T00:00:00Z") shouldBe false // newer
    store.shouldSkipFile("f1", "2024-01-02T00:00:00Z", lookbackDays = 7) shouldBe false
  }

  test("cursor state: persist + read back under object.field key") {
    val store = newStore(Files.createTempDirectory("state-"))
    store.cursorLastValue("users", "updated_at") shouldBe None
    store.updateCursorState("users", "updated_at", "2024-05-01T10:00:00")
    store.cursorLastValue("users", "updated_at") shouldBe Some("2024-05-01T10:00:00")
    val entry = store.read()("users.updated_at")
    entry.keySet should contain("updated_at") // audit timestamp recorded
  }

  test("filterUnmodified partitions real files by recorded mtime") {
    val dir = Files.createTempDirectory("state-files-")
    val f1 = dir.resolve("a.csv"); Files.writeString(f1, "x")
    val f2 = dir.resolve("b.csv"); Files.writeString(f2, "y")
    val store = newStore(dir)
    val (todo1, skip1) = store.filterUnmodified(Seq(f1.toString, f2.toString))
    todo1.size shouldBe 2
    skip1 shouldBe empty
    store.updateFileStates(Seq(f1.toString))
    val (todo2, skip2) = store.filterUnmodified(Seq(f1.toString, f2.toString))
    todo2 shouldBe Seq(f2.toString)
    skip2 shouldBe Seq(f1.toString)
  }

  test("corrupt state file reads as empty") {
    val dir = Files.createTempDirectory("state-")
    val p = dir.resolve("bad.state.json")
    Files.writeString(p, "{not json")
    new StateStore(p.toString, spark).read() shouldBe Map.empty
  }
}
