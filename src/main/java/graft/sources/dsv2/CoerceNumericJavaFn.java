package graft.sources.dsv2;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.catalog.functions.ScalarFunction;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * {@code coerce_numeric} with a STATIC magic method — see
 * {@link WordNgramsJavaFn} for why the Scala object's instance
 * {@code invoke} fell back to interpreter mode under Janino.
 * Delegates to the same {@link graft.functions.CoerceNumeric} kernel
 * as the session-registered expression.
 */
public final class CoerceNumericJavaFn implements ScalarFunction<Double> {

  public static final CoerceNumericJavaFn INSTANCE = new CoerceNumericJavaFn();

  private CoerceNumericJavaFn() {}

  @Override public String name() { return "coerce_numeric"; }

  @Override public DataType[] inputTypes() {
    return new DataType[] { DataTypes.StringType };
  }

  @Override public DataType resultType() { return DataTypes.DoubleType; }

  @Override public boolean isResultNullable() { return true; }

  /** The static MAGIC method — planned as a codegen'd StaticInvoke. */
  public static Double invoke(UTF8String s) {
    return graft.functions.CoerceNumeric.coerce(s);
  }

  @Override public Double produceResult(InternalRow input) {
    return invoke(input.getUTF8String(0));
  }
}
