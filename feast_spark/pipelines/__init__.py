from feast_spark.pipelines.corpus import CorpusConfig, build_corpus

__all__ = ["CorpusConfig", "build_corpus"]
