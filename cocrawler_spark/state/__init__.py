"""Engine state machinery: bloom sidecar, partitioning helpers."""
