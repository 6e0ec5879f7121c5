package graft.table

import java.nio.file.Path

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetWriter}
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Parquet encoding of a checkpoint (the full folded snapshot: metaData +
  * live AddFiles + per-app txn versions + protocol) — what a text-JSON
  * checkpoint becomes once a table has enough files that parsing a JSON
  * line per file dominates log replay (Delta's checkpoints are parquet for
  * the same reason). One row per action; the hot per-file scalars (path,
  * size, numRecords, ...) are typed parquet columns read without any JSON
  * work, while the small string-map fields (stats, partition values, table
  * properties) stay JSON-encoded in binary columns. Written and read with
  * parquet-mr's public Example API — GraftLog stays free of any
  * SparkSession, so snapshot resolution works on a bare driver. */
object CheckpointCodec {

  private val mapper = new ObjectMapper()

  private val schema: MessageType = {
    def optLong(n: String) = Types.primitive(INT64, Type.Repetition.OPTIONAL).named(n)
    def optStr(n: String) = Types.primitive(BINARY, Type.Repetition.OPTIONAL)
      .as(LogicalTypeAnnotation.stringType()).named(n)
    new MessageType("graft_checkpoint",
      Types.primitive(BINARY, Type.Repetition.REQUIRED)
        .as(LogicalTypeAnnotation.stringType()).named("kind"), // meta | add | txn | protocol
      optStr("path"), optLong("size"), optLong("modificationTime"),
      optLong("numRecords"), optStr("minValues"), optStr("maxValues"),
      optStr("partitionValues"), optStr("dvPath"), optLong("dvCount"),
      optStr("metaId"), optStr("schemaString"), optLong("createdTime"),
      optStr("partitionColumns"), optStr("constraints"), optStr("properties"),
      optStr("txnAppId"), optLong("txnVersion"), optStr("protocolJson"))
  }

  private def jsonMap(m: Map[String, String]): String = {
    val node = mapper.createObjectNode()
    m.foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }

  private def jsonSeq(s: Seq[String]): String = {
    val node = mapper.createArrayNode()
    s.foreach(node.add)
    mapper.writeValueAsString(node)
  }

  private def readMap(s: String): Map[String, String] = {
    val node = mapper.readTree(s)
    node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  private def readSeq(s: String): Seq[String] =
    mapper.readTree(s).elements().asScala.map(_.asText()).toSeq

  def write(file: Path, s: Snapshot): Unit = {
    val factory = new SimpleGroupFactory(schema)
    val w: ParquetWriter[Group] = ExampleParquetWriter.builder(new HPath(file.toString))
      .withType(schema).withConf(new Configuration())
      .withCompressionCodec(CompressionCodecName.SNAPPY).build()
    try {
      val meta = s.metaData
      val pg = factory.newGroup()
      pg.add("kind", "protocol")
      pg.add("protocolJson", Actions.toJson(s.protocol))
      w.write(pg)
      val mg = factory.newGroup()
      mg.add("kind", "meta")
      mg.add("metaId", meta.id)
      mg.add("schemaString", meta.schemaString)
      mg.add("createdTime", meta.createdTime)
      mg.add("partitionColumns", jsonSeq(meta.partitionColumns))
      mg.add("constraints", jsonMap(meta.constraints))
      mg.add("properties", jsonMap(meta.properties))
      w.write(mg)
      s.transactions.toSeq.sortBy(_._1).foreach { case (appId, tv) =>
        val tg = factory.newGroup()
        tg.add("kind", "txn")
        tg.add("txnAppId", appId)
        tg.add("txnVersion", tv)
        w.write(tg)
      }
      s.files.foreach { f =>
        val g = factory.newGroup()
        g.add("kind", "add")
        g.add("path", f.path)
        g.add("size", f.size)
        g.add("modificationTime", f.modificationTime)
        g.add("numRecords", f.numRecords)
        g.add("minValues", jsonMap(f.minValues))
        g.add("maxValues", jsonMap(f.maxValues))
        g.add("partitionValues", jsonMap(f.partitionValues))
        f.dvPath.foreach { p => g.add("dvPath", p); g.add("dvCount", f.dvCount) }
        w.write(g)
      }
    } finally w.close()
  }

  /** Read a parquet checkpoint back to the folded snapshot at `version`. */
  def read(file: Path, version: Long): Snapshot = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(file.toString), new Configuration()))
    try {
      var meta: Option[MetaData] = None
      var protocol: Protocol = Protocol()
      val txns = Map.newBuilder[String, Long]
      val files = Seq.newBuilder[AddFile]
      def str(g: Group, n: String): String = g.getBinary(n, 0).toStringUsingUTF8
      def opt(g: Group, n: String): Boolean =
        g.getType.asGroupType().containsField(n) &&
          g.getFieldRepetitionCount(n) > 0
      // decode with the FILE's own schema: a checkpoint written before a
      // column was added (e.g. dvPath) stays readable — absent fields
      // simply report not-present
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      var rg = Option(reader.readNextRowGroup())
      while (rg.isDefined) {
        val rr = new ColumnIOFactory().getColumnIO(fileSchema)
          .getRecordReader(rg.get, new GroupRecordConverter(fileSchema))
        (0L until rg.get.getRowCount).foreach { _ =>
          val g = rr.read()
          str(g, "kind") match {
            case "meta" => meta = Some(MetaData(
              str(g, "metaId"), str(g, "schemaString"), g.getLong("createdTime", 0),
              readSeq(str(g, "partitionColumns")), readMap(str(g, "constraints")),
              readMap(str(g, "properties"))))
            case "add" => files += AddFile(
              str(g, "path"), g.getLong("size", 0), g.getLong("modificationTime", 0),
              g.getLong("numRecords", 0), readMap(str(g, "minValues")),
              readMap(str(g, "maxValues")), readMap(str(g, "partitionValues")),
              if (opt(g, "dvPath")) Some(str(g, "dvPath")) else None,
              if (opt(g, "dvCount")) g.getLong("dvCount", 0) else 0L)
            case "txn" => txns += str(g, "txnAppId") -> g.getLong("txnVersion", 0)
            case "protocol" => Actions.fromJson(str(g, "protocolJson")) match {
              case p: Protocol => protocol = p
              case _ => ()
            }
          }
        }
        rg = Option(reader.readNextRowGroup())
      }
      Snapshot(version, meta.getOrElse(throw new IllegalStateException(
        s"parquet checkpoint $file lacks metaData")), files.result(),
        txns.result(), protocol)
    } finally reader.close()
  }
}
