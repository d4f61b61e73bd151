import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A declared query: (session, scale-factor dir) → result DataFrame.
    * The driver contract (SparkEntry.queries) — see SURVEY.md §2.2.
    */
  type Q = (SparkSession, String) => DataFrame
}
