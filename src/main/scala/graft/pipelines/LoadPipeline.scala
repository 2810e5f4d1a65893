package graft.pipelines

import graft.io.Lake
import graft.schema.Schemas

/** Batch lake→staging load — re-expression of
  * idr_pipeline_from_server/dags/idr_load.py:73-130.
  *
  * The reference runs the MMD pandas stringify load first, then three
  * parallel schema-preserving bucket loads (idr_load.py:129-130 fan-out O6).
  * Here each is one Stage; the three parquet loads are single distributed
  * scans (S1), the MMD path is the S4 stringify-dedup-renormalize read.
  */
object LoadPipeline {

  /** @param lakeRoots extract name -> lake directory (parquet files). */
  def pipeline(lakeRoots: Map[String, String]): Pipeline = Pipeline(
    name = "idr_load",
    stages = Seq(
      // idr_load.py:77-81 + parquet_solution.py:67-125 — pandas stringify path
      Stage("load_data_MMD", "mmd_staging", (s, _) =>
        Lake.readAllAsString(s, Seq(lakeRoots("mmd")))),
      // idr_load.py:83-92,94-103,105-114 — GCSToBigQuery parquet loads
      Stage("staging_dataset_VLS", "vls_staging", (s, _) =>
        Lake.readParquet(s, lakeRoots("vls"), Schemas.vlsStaging)),
      Stage("staging_dataset_HTS", "hts_staging", (s, _) =>
        Lake.readParquet(s, lakeRoots("hts"), Schemas.htsStaging)),
      Stage("staging_dataset_COVID", "covid_staging", (s, _) =>
        Lake.readParquet(s, lakeRoots("covid"), Schemas.covidStaging))
      // publish_messages / finish_pipeline (idr_load.py:116-125) are the
      // streaming notification path — graft.streaming.EventIngest.
    ))
}
