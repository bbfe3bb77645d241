"""Sources & sinks: table loaders, lineage/checkpoint + resume."""
