"""feast_spark — a PySpark-native feature/analytics engine.

A from-scratch rebuild of the capabilities of Feast v0.11 (reference:
/root/reference, gojek/feast) expressed idiomatically on the Spark
DataFrame/SQL/Structured-Streaming stack, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) that a 100 TB corpus pipeline needs.

Design stance (see SURVEY.md):
- Everything is a DataFrame; plans are declared via the DataFrame API so
  Catalyst handles pushdown/pruning/join selection.
- The core temporal operator (point-in-time as-of join) is implemented
  shuffle-minimally as union + window (one hash partition by entity key)
  instead of a range join, so it survives 100x scale-up.
- No pandas in the execution path; pandas only at `to_df()` API edges.
"""

from feast_spark.types import ValueType
from feast_spark.entity import Entity
from feast_spark.feature import Feature
from feast_spark.data_source import (
    DataSource,
    FileSource,
    KafkaSource,
    KinesisSource,
    SparkSqlSource,
)
from feast_spark.feature_view import (
    FeatureView,
    FeatureService,
    OnDemandFeatureView,
)
from feast_spark.registry import Registry
from feast_spark.datasets import commit_dataset, diff_dataset, read_dataset
from feast_spark.feature_store import FeatureStore, RepoConfig
from feast_spark.pipelines import CorpusConfig, build_corpus
from feast_spark.provenance import (
    RunReplay,
    load_provenance,
    snapshot_provenance,
)
from feast_spark.serving import OnlineServingServer, serve_online

__all__ = [
    "CorpusConfig",
    "build_corpus",
    "ValueType",
    "Entity",
    "Feature",
    "DataSource",
    "FileSource",
    "KafkaSource",
    "KinesisSource",
    "SparkSqlSource",
    "OnlineServingServer",
    "serve_online",
    "FeatureView",
    "FeatureService",
    "OnDemandFeatureView",
    "Registry",
    "FeatureStore",
    "RepoConfig",
    "RunReplay",
    "load_provenance",
    "snapshot_provenance",
    "commit_dataset",
    "diff_dataset",
    "read_dataset",
]

__version__ = "0.1.0"
