"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata; decode/feature-extract as Arrow-batched
mapInPandas stages. Real codecs are gated (none in this container);
the Spark-side plumbing — schema, partitioning, UDF signatures,
batch shapes — is real and tested with a deterministic fake decoder."""
