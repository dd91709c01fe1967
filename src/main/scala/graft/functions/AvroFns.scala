package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.{BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Avro wire envelope for the Kafka sink — the reference's second
  * value encoding (handler/kafka.go:449-472 AvroEncoder + the goavro
  * codec path at kafka.go:373-401): Confluent schema-registry framing
  * (magic byte 0, 4-byte big-endian schema id) followed by the Avro
  * binary encoding of the 13-field payload record.
  *
  * Encoded by a codegen'd expression calling one kernel per row; the
  * kernel writes fields straight from the InternalRow through a
  * reused Avro BinaryEncoder (no GenericRecord allocation, no UTF-8
  * re-decode — Avro strings are length-prefixed UTF-8 and the row
  * already holds UTF-8 bytes).
  */
case class AvroEnvelopeExpr(child: Expression, schemaId: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(row: Any): Any =
    AvroEnvelope.encode(row.asInstanceOf[InternalRow], schemaId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      r => s"graft.functions.AvroEnvelope.encode($r, $schemaId)")
  override protected def withNewChildInternal(c: Expression): AvroEnvelopeExpr =
    copy(child = c)
}

object AvroEnvelope {

  /** The payload record as a real Avro schema (type `record` — the
    * JSON envelope's `struct` schema is Kafka-Connect dialect; see the
    * dialect-mapping notes at handler/kafka.go:27-33). Field order is
    * the reference's LogfileEncoder order and is load-bearing: Avro
    * binary is positional.
    */
  val RecordSchemaAvroJson: String =
    """{"type":"record","name":"dcagent_value","fields":[""" +
      """{"name":"file_date","type":"string"},{"name":"file_time","type":"long"},""" +
      """{"name":"folder","type":"string"},{"name":"pack","type":"string"},""" +
      """{"name":"name","type":"string"},{"name":"size","type":"long"},""" +
      """{"name":"modify_time","type":"long"},{"name":"content","type":"string"},""" +
      """{"name":"compress","type":"boolean"},{"name":"compress_size","type":"long"},""" +
      """{"name":"checksum","type":"string"},{"name":"host","type":"string"},""" +
      """{"name":"folder_time","type":"long"}]}"""

  lazy val schema: Schema = new Schema.Parser().parse(RecordSchemaAvroJson)

  def envelope(payload: Column, schemaId: Int): Column =
    columnOf(AvroEnvelopeExpr(expressionOf(payload), schemaId))

  private val encoderReuse = new ThreadLocal[BinaryEncoder]

  private val FieldNames = Array("file_date", "file_time", "folder", "pack",
    "name", "size", "modify_time", "content", "compress", "compress_size",
    "checksum", "host", "folder_time")

  /** Confluent framing + positional Avro binary of the payload struct
    * (column order must match [[RecordSchemaAvroJson]]). The schema has
    * no null unions (the reference's Go struct cannot be null either),
    * so a null field fails loudly by name instead of NPE-ing the
    * micro-batch — the JSON wire would have encoded `null` silently,
    * which an Avro consumer could not read back.
    */
  def encode(row: InternalRow, schemaId: Int): Array[Byte] = {
    var i = 0
    while (i < 13) {
      if (row.isNullAt(i))
        throw new IllegalArgumentException(
          s"avro envelope: null '${FieldNames(i)}' (schema has no null union)")
      i += 1
    }
    val out = new ByteArrayOutputStream(128)
    out.write(0) // Confluent serialization format magic; currently always 0
    out.write((schemaId >>> 24) & 0xff)
    out.write((schemaId >>> 16) & 0xff)
    out.write((schemaId >>> 8) & 0xff)
    out.write(schemaId & 0xff)
    val enc = EncoderFactory.get().directBinaryEncoder(out, encoderReuse.get())
    encoderReuse.set(enc)
    def s(i: Int): Unit =
      enc.writeString(new Utf8(row.getUTF8String(i).getBytes))
    s(0); enc.writeLong(row.getLong(1)); s(2); s(3); s(4)
    enc.writeLong(row.getLong(5)); enc.writeLong(row.getLong(6)); s(7)
    enc.writeBoolean(row.getBoolean(8)); enc.writeLong(row.getLong(9))
    s(10); s(11); enc.writeLong(row.getLong(12))
    enc.flush()
    out.toByteArray
  }

  /** Consumer-side dual (and the test oracle): unframe + decode with a
    * GenericDatumReader against the published schema, which fails
    * loudly if the positional encoding ever drifts from it.
    */
  def decode(bytes: Array[Byte]): (Int, GenericRecord) = {
    require(bytes.length >= 5 && bytes(0) == 0,
      "not a Confluent-framed Avro message")
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
    val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    (id, rec)
  }
}
