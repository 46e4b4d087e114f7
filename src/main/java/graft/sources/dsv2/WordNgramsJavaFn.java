package graft.sources.dsv2;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.util.ArrayData;
import org.apache.spark.sql.connector.catalog.functions.ScalarFunction;
import org.apache.spark.sql.types.ArrayType;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * The {@code word_ngrams} catalog function with a STATIC magic method.
 *
 * Spark resolves a bound V2 scalar function's {@code invoke} first as a
 * static method of the function's own class (planned as a codegen'd
 * {@code StaticInvoke}), then as an instance method ({@code Invoke}).
 * The former Scala {@code object} implementation could only offer the
 * instance form, whose generated call Janino rejected ("no applicable
 * method" for the exact declared signature), so every MutableProjection
 * containing the call fell back to interpreter mode per task — compile
 * exception cost included. Java is the one place a true static lives;
 * the body delegates to the same {@link graft.functions.WordNgrams}
 * kernel the session-registered Catalyst expression uses, so results
 * are identical by construction.
 */
public final class WordNgramsJavaFn implements ScalarFunction<ArrayData> {

  public static final WordNgramsJavaFn INSTANCE = new WordNgramsJavaFn();

  private WordNgramsJavaFn() {}

  @Override public String name() { return "word_ngrams"; }

  @Override public DataType[] inputTypes() {
    return new DataType[] { DataTypes.StringType, DataTypes.IntegerType };
  }

  @Override public DataType resultType() {
    return new ArrayType(DataTypes.StringType, false);
  }

  @Override public boolean isResultNullable() { return true; }

  /** The static MAGIC method — planned as a codegen'd StaticInvoke. */
  public static ArrayData invoke(UTF8String s, int n) {
    return s == null ? null : graft.functions.WordNgrams.compute(s, n);
  }

  @Override public ArrayData produceResult(InternalRow input) {
    return invoke(input.getUTF8String(0), input.getInt(1));
  }
}
