"""Function layer: scalar/text/dedup/similarity/multimodal primitives.

Everything here is built from native pyspark.sql.functions column
expressions (JVM-side, whole-stage-codegen-friendly) unless a pandas UDF is
genuinely required (multimodal decode), per the 100 TB mandate: no Python in
per-row hot paths.
"""
