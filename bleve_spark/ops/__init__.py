"""Large-scale training-data pipeline operators built on the engine's
analysis layer: deduplication, similarity search, text analysis,
multimodal plumbing."""
