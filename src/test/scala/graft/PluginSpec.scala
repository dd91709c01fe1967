package graft

import graft.plugins._
import org.apache.spark.sql.functions._

class PluginSpec extends GraftSpec {
  import spark.implicits._

  private val ini =
    """switch = true
      |; global comment
      |[BSI]
      |watch = /data/bsi
      |patterns = (?i).*\.(zip|txt)$
      |max_nesting_level = 5
      |debounce = 2000
      |[SPI.DAT]
      |watch = /data/spi
      |patterns = .*\.dat$
      |history_import = false
      |[IGNORED]
      |switch = false
      |watch = /data/x
      |[NOWATCH]
      |foo = bar
      |""".stripMargin

  test("ini autoload builds active plugins with rule config") {
    val plugins = PluginRegistry.autoload(IniConfig.parse(ini))
    assert(plugins.map(_.name).toSet == Set("BSI", "SPI.DAT"))
    val bsi = plugins.find(_.name == "BSI").get
    assert(bsi.isInstanceOf[BsiPlugin])
    assert(bsi.rule.debounceMs == 2000 && bsi.rule.maxNestingLevel == 5)
    val spi = plugins.find(_.name == "SPI.DAT").get
    assert(!spi.rule.historyImport)
  }

  test("plugin pipeline scopes rows by biz+rule and applies BSI transform") {
    val zero = java.sql.Timestamp.valueOf("1970-01-01 00:00:00")
    val records = Seq(
      // BSI record with a valid 4-segment test-id folder
      ("BSI", "LOUP/1395T2936101/2017-06-07/MBBIVS171700094_1W_1_2017-06-07_16_15_42_797/FLOWLOG.ZIP",
        "LOUP/1395T2936101/2017-06-07/MBBIVS171700094_1W_1_2017-06-07_16_15_42_797", zero, zero),
      // BSI record that does not match the pattern -> dropped
      ("BSI", "LOUP/a/b/c/run.log", "LOUP/a/b/c", zero, zero),
      // SPI record
      ("SPI.DAT", "Rockaway/m1/x.dat", "Rockaway/m1", zero, zero))
      .toDF("biz", "path", "folder", "folder_time", "create_time")

    val plugins = PluginRegistry.autoload(IniConfig.parse(ini))
    val out = PluginRegistry.pipeline(records, plugins)
      .select("biz", "path", "folder_time").collect()
    assert(out.length == 2)
    val bsiRow = out.find(_.getString(0) == "BSI").get
    assert(bsiRow.getTimestamp(2).toString == "2017-06-07 16:15:42.797")
    val spiRow = out.find(_.getString(0) == "SPI.DAT").get
    assert(spiRow.getTimestamp(2) == zero) // SPI default: untouched
  }

  test("the reference's real logagent.ini parses end-to-end") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/conf/logagent.ini")), "UTF-8")
    val conf = IniConfig.parse(text)

    // global section: switch + hostname survive the `;` comment style
    val global = conf.sections.find(_.name == "").get
    assert(global.values("switch") == "true")
    assert(global.values.contains("hostname"))

    // [KAFKA] carries brokers but no watch -> config-only, not a plugin
    val kafka = conf.sections.find(_.name == "KAFKA").get
    assert(kafka.values("brokers").split(",").length == 3)
    assert(!kafka.values.contains("watch"))

    // every BSI/SPI/ICT handler block in the file is `;`-commented out
    // except [SPI.DAT] -> autoload yields exactly that one plugin
    val plugins = PluginRegistry.autoload(conf)
    assert(plugins.map(_.name) == Seq("SPI.DAT"))
    val spi = plugins.head
    assert(spi.isInstanceOf[SpiPlugin])
    assert(spi.rule.patterns == ".*\\.dat$")
    assert(spi.rule.maxNestingLevel == 1)
    assert(spi.rule.debounceMs == 3000)
    assert(!spi.rule.historyImport)

    // and its rule actually scopes paths the way the agent would
    assert(spi.rule.ignores == "") // `; ignores = .*` stays commented
    // paths relative to watch/subdir, within max_nesting_level = 1
    val scoped = PluginRegistry.pipeline(
      Seq(("SPI.DAT", "Rockaway/x.dat"), ("SPI.DAT", "Rockaway/x.log"),
        ("SPI.DAT", "Rockaway/deep/nested/x.dat")) // nesting 3 > cap
        .toDF("biz", "path"), plugins).select("path").as[String].collect()
    assert(scoped.toSeq == Seq("Rockaway/x.dat"))
  }
}
