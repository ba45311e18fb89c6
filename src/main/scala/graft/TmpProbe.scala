package graft
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sql("""SELECT ascii('😀') a, ascii('é') b, ascii('𝄞') c, length('😀') l,
      split('a  b', ' ') sp, split('', ' ') spe, split(' ', ' ') sps""").show(false)
    spark.stop()
  }
}
