package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}

/** `blooms(fid) == null || blooms(fid).mightContainLong(key)` — the
  * codegen filter the mutation candidate probe applies after range
  * pruning: a candidate file whose Bloom sidecar excludes the key drops
  * out; a file without a sidecar (null slot) stays a candidate. The
  * bloom array rides the closure via `addReferenceObj`, indexed by the
  * table's file index (the same index the range probe emits). */
case class BloomHit(blooms: Array[Any], fid: Expression, key: Expression)
    extends BinaryExpression {
  override def left: Expression = fid
  override def right: Expression = key
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_hit"

  override def checkInputDataTypes(): TypeCheckResult =
    if (fid.dataType == IntegerType &&
        (key.dataType == LongType || key.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int fid, long|string key), got " +
        s"(${fid.dataType.catalogString}, ${key.dataType.catalogString})")

  override def nullSafeEval(f: Any, k: Any): Any = k match {
    case s: org.apache.spark.unsafe.types.UTF8String =>
      BloomHitImpl.testString(blooms, f.asInstanceOf[Int], s)
    case l => BloomHitImpl.test(blooms, f.asInstanceOf[Int],
      l.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blooms", blooms, "java.lang.Object[]")
    val method =
      if (key.dataType == StringType) "testString" else "test"
    defineCodeGen(ctx, ev, (f, k) =>
      s"graft.expressions.BloomHitImpl.$method($ref, $f, $k)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomHit =
    copy(fid = newLeft, key = newRight)
}

object BloomHitImpl {
  def test(blooms: Array[Any], fid: Int, key: Long): Boolean = {
    val b = blooms(fid)
    b == null ||
      b.asInstanceOf[org.apache.spark.util.sketch.BloomFilter].mightContainLong(key)
  }

  /** String keys probe with the key's UTF-8 bytes — the exact bytes
    * BloomFilter.putString hashed at build time (UTF8String already holds
    * them; going through java.lang.String would copy twice per row). */
  def testString(blooms: Array[Any], fid: Int,
                 key: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val b = blooms(fid)
    b == null ||
      b.asInstanceOf[org.apache.spark.util.sketch.BloomFilter]
        .mightContainBinary(key.getBytes)
  }
}
