package graft.sources.dsv2;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.catalog.functions.ScalarFunction;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * {@code py_to_json} with a STATIC magic method — see
 * {@link WordNgramsJavaFn} for why the Scala object's instance
 * {@code invoke} fell back to interpreter mode under Janino.
 * Delegates to the same {@link graft.functions.PyLiteral} kernel as
 * the session-registered expression.
 */
public final class PyToJsonJavaFn implements ScalarFunction<UTF8String> {

  public static final PyToJsonJavaFn INSTANCE = new PyToJsonJavaFn();

  private PyToJsonJavaFn() {}

  @Override public String name() { return "py_to_json"; }

  @Override public DataType[] inputTypes() {
    return new DataType[] { DataTypes.StringType };
  }

  @Override public DataType resultType() { return DataTypes.StringType; }

  @Override public boolean isResultNullable() { return true; }

  /** The static MAGIC method — planned as a codegen'd StaticInvoke. */
  public static UTF8String invoke(UTF8String s) {
    if (s == null) return null;
    String json = graft.functions.PyLiteral.toJson(s.toString());
    return json == null ? null : UTF8String.fromString(json);
  }

  @Override public UTF8String produceResult(InternalRow input) {
    return invoke(input.getUTF8String(0));
  }
}
