"""Column-level function library: text analysis + multimodal stubs."""
