"""Sources & sinks: corpus/seed/robots readers, the snapshot catalog."""
