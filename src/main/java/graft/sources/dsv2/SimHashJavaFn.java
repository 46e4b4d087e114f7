package graft.sources.dsv2;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.catalog.functions.ScalarFunction;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * {@code simhash_fingerprint} with a STATIC magic method — see
 * {@link WordNgramsJavaFn} for why the Scala object's instance
 * {@code invoke} fell back to interpreter mode under Janino.
 * Delegates to the same {@link graft.functions.SimHashFingerprint}
 * kernel as the session-registered expression.
 */
public final class SimHashJavaFn implements ScalarFunction<UTF8String> {

  public static final SimHashJavaFn INSTANCE = new SimHashJavaFn();

  private SimHashJavaFn() {}

  @Override public String name() { return "simhash_fingerprint"; }

  @Override public DataType[] inputTypes() {
    return new DataType[] { DataTypes.StringType, DataTypes.IntegerType };
  }

  @Override public DataType resultType() { return DataTypes.StringType; }

  @Override public boolean isResultNullable() { return true; }

  /** The static MAGIC method — planned as a codegen'd StaticInvoke. */
  public static UTF8String invoke(UTF8String s, int bits) {
    return s == null ? null
        : graft.functions.SimHashFingerprint.compute(s, bits);
  }

  @Override public UTF8String produceResult(InternalRow input) {
    return invoke(input.getUTF8String(0), input.getInt(1));
  }
}
