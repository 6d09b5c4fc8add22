"""AutoDW facade: the reference's user API re-expressed for Spark
(SURVEY.md section 2.8).

    auto_dw.go()               -> AutoDW.go()          (src/lib.rs:16-37)
    auto_dw.source_include()   -> AutoDW.source_include (src/lib.rs:39-59)
    auto_dw.source_exclude()   -> AutoDW.source_exclude (src/lib.rs:61-79)
    auto_dw.source_table()     -> AutoDW.source_table  (src/lib.rs:81-111)
    auto_dw.source_column()    -> AutoDW.source_column (src/lib.rs:113-151)
    auto_dw.hash(text)         -> AutoDW.hash          (src/lib.rs:153-157)

Plus the two background workers as explicit methods (crawl /
classify_pending) -- cadence is the caller's choice; the merge and the
anti-join loads are idempotent, so any schedule is safe (SURVEY 2.9).
"""

from __future__ import annotations

import datetime
import hashlib
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .build.builder import (
    add_target_columns,
    assemble_business_keys,
    build_and_load,
    build_object_pull,
    ready_build_call_rows,
)
from .catalog.introspect import catalog_snapshot
from .catalog.registry import SourceRegistry, synthetic_oid
from .catalog.scd2 import SOURCE_OBJECTS_SCHEMA, crawl as scd2_crawl
from .classify.client import Classifier, DeterministicStub
from .classify.pending import source_table_prompts
from .model.dv_schema import DVSchema
from .model.status import (
    BUILD_CALL_SCHEMA,
    TRANSFORMER_RESPONSES_SCHEMA,
    source_column_df,
    source_table_df,
)
from .session import prepare
from .warehouse import Warehouse

DV_REPO_SCHEMA = T.StructType(
    [
        T.StructField("build_id", T.StringType(), False),
        T.StructField("insert_time", T.TimestampType(), True),
        T.StructField("schema", T.StringType(), True),  # JSON text
    ]
)

LOG_SCHEMA = T.StructType(
    [
        T.StructField("pk_log", T.LongType(), False),
        T.StructField("log_ts", T.TimestampType(), True),
        T.StructField("process", T.StringType(), True),
        T.StructField("level", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)


class AutoDW:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        registry: SourceRegistry | None = None,
        dw_schema: str = "dw",
        confidence_threshold: str = "0.8",
        model_name: str = "deterministic-stub",
        transport=None,
        clock=None,
    ):
        self.spark = prepare(spark)
        self.wh = Warehouse(spark, warehouse_root)
        self.registry = registry or SourceRegistry()
        self.dw_schema = dw_schema
        self.confidence_threshold = confidence_threshold
        self.model_name = model_name
        self.classifier = Classifier(transport or DeterministicStub(), model_name)
        self._clock = clock or (lambda: datetime.datetime.utcnow().replace(microsecond=0))
        self._sources: dict[tuple[str, str], DataFrame] = {}
        self.system_id = 4242  # pg_control_system analog (S3): fixed app id
        for name, schema in (
            ("auto_dw.source_objects", SOURCE_OBJECTS_SCHEMA),
            ("auto_dw.transformer_responses", TRANSFORMER_RESPONSES_SCHEMA),
            ("auto_dw.build_call", BUILD_CALL_SCHEMA),
            ("auto_dw.dv_repo", DV_REPO_SCHEMA),
            ("auto_dw.log", LOG_SCHEMA),
        ):
            self.wh.create_table(name, schema)

    # -- source registration (stand-in for "tables living in Postgres") --
    def register_source(self, schema_name: str, table_name: str, df: DataFrame) -> None:
        self._sources[(schema_name, table_name)] = df

    def resolve_source(self, schema_name: str, table_name: str) -> DataFrame:
        return self._sources[(schema_name, table_name)]

    # -- catalog crawl (bgw_source_objects analog) ----------------------
    def _snapshot(self) -> DataFrame:
        return catalog_snapshot(self.spark, self._sources, self.registry)

    def crawl(self, include=("a^", "a^", "a^"), exclude=("a^", "a^", "a^")) -> dict:
        return scd2_crawl(
            self.wh, self._snapshot(), include=include, exclude=exclude, as_of=self._clock()
        )

    def source_include(self, schema: str, table: str = ".*", column: str = ".*") -> str:
        self.crawl(include=(schema, table, column))
        self._log("source_include", "INFO", f"Pattern Included: {schema}/{table}/{column}")
        return "Pattern Included"

    def source_exclude(self, schema: str, table: str = ".*", column: str = ".*") -> str:
        self.crawl(include=("a^", "a^", "a^"), exclude=(schema, table, column))
        self._log("source_exclude", "INFO", f"Pattern Excluded: {schema}/{table}/{column}")
        return "Pattern Excluded"

    # -- classification (bgw_transformer_client analog) -----------------
    def classify_pending(self) -> int:
        import decimal
        import json

        so = self.wh.read("auto_dw.source_objects")
        tr = self.wh.read("auto_dw.transformer_responses")
        prompts = source_table_prompts(so, tr).collect()
        all_rows = []
        for p in prompts:
            links = {
                link["Column Ordinal Position"]: link["PK Source Objects"]
                for link in json.loads(p["table_column_links"])["Column Links"]
            }
            all_rows.extend(self.classifier.classify_table(p["table_details"], links))
        if not all_rows:
            return 0
        max_pk = tr.agg(F.max("pk_transformer_responses")).collect()[0][0] or 0
        now = self._clock()
        data = [
            (
                max_pk + i + 1,
                r.fk_source_objects,
                r.model_name,
                r.category,
                r.business_key_name,
                decimal.Decimal(r.confidence_score),
                r.reason,
                now,
            )
            for i, r in enumerate(all_rows)
        ]
        self.wh.append(
            "auto_dw.transformer_responses",
            self.spark.createDataFrame(data, TRANSFORMER_RESPONSES_SCHEMA),
        )
        self._log("transformer_client", "INFO", f"Inserted {len(data)} responses.")
        return len(data)

    # -- status views ---------------------------------------------------
    def source_column(self) -> DataFrame:
        return source_column_df(
            self.wh.read("auto_dw.source_objects"),
            self.wh.read("auto_dw.transformer_responses"),
            self.confidence_threshold,
        )

    def source_table(self) -> DataFrame:
        return source_table_df(
            self.wh.read("auto_dw.source_objects"),
            self.wh.read("auto_dw.transformer_responses"),
            self.confidence_threshold,
        )

    # -- build + load ---------------------------------------------------
    def go(self, flag: str = "Build", load_ts: datetime.datetime | None = None) -> str:
        build_id = str(uuid.uuid4())
        so = self.wh.read("auto_dw.source_objects")
        tr = self.wh.read("auto_dw.transformer_responses")
        bc_rows = ready_build_call_rows(so, tr, self.confidence_threshold, build_id)
        max_pk = (
            self.wh.read("auto_dw.build_call").agg(F.max("pk_build_call")).collect()[0][0]
            or 0
        )
        from pyspark.sql import Window

        w = Window.orderBy("fk_transformer_responses")
        bc = (
            bc_rows.withColumn("pk_build_call", F.row_number().over(w) + F.lit(max_pk))
            .withColumn("created_at", F.lit(self._clock()).cast("timestamp"))
            .select([f.name for f in BUILD_CALL_SCHEMA.fields])
        )
        self.wh.append("auto_dw.build_call", bc)

        pulled = build_object_pull(
            self.wh.read("auto_dw.build_call"), tr, so, build_id, self.system_id
        ).collect()
        business_keys = assemble_business_keys(pulled)
        dv = DVSchema(dw_schema=self.dw_schema, business_keys=business_keys)
        add_target_columns(dv)

        self.wh.append(
            "auto_dw.dv_repo",
            self.spark.createDataFrame(
                [(build_id, self._clock(), dv.to_json())], DV_REPO_SCHEMA
            ),
        )
        build_and_load(self.wh, self.resolve_source, dv, load_ts=load_ts)
        msg = f"Build ID: {build_id} | Data warehouse tables are currently being built."
        self._log("go", "INFO", msg)
        return msg

    def latest_dv_schema(self) -> DVSchema | None:
        rows = (
            self.wh.read("auto_dw.dv_repo").orderBy(F.col("insert_time").desc()).limit(1).collect()
        )
        return DVSchema.from_json(rows[0]["schema"]) if rows else None

    # -- misc -----------------------------------------------------------
    @staticmethod
    def hash(text: str) -> str:
        """auto_dw.hash (src/lib.rs:153-157): lowercase hex sha256."""
        return hashlib.sha256(text.encode()).hexdigest()

    def _log(self, process: str, level: str, message: str) -> None:
        log = self.wh.read("auto_dw.log")
        max_pk = log.agg(F.max("pk_log")).collect()[0][0] or 0
        self.wh.append(
            "auto_dw.log",
            self.spark.createDataFrame(
                [(max_pk + 1, self._clock(), process, level, message)], LOG_SCHEMA
            ),
        )
