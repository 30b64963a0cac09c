"""unfurl_spark — a from-scratch PySpark-native rich-metadata extraction engine.

Reproduces the query/data-processing capabilities of the reference
``borderless/unfurl`` (TypeScript middleware scraper) as an idiomatic
Spark pipeline over tables of interleaved text+media documents:

    (doc_id: string,
     spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>)

Layout:
    functions/   pure-Python batch kernels (HTML meta tokenizer, JSON-LD
                 expansion subset, field extractors, JS-semantics coercions,
                 media header readers, main-content strip) — unit-testable
                 without Spark, executed Arrow-batched inside mapInPandas.
    operators/   Spark DataFrame pipelines (the fused extract stage, span
                 emission, relational building blocks).
    sources/     fixture importer (reference test corpus -> span table),
                 deterministic synthetic corpus generator.
    plans/       job driver: salted repartition, checkpointed per-partition
                 lineage + metrics, idempotent resume.
    streaming/   Structured Streaming wrapper over the same extract stage.
"""

__version__ = "0.1.0"
