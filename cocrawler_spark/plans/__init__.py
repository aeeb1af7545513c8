"""Crawl dataflow plans: wave pipeline, run loop, metrics."""
