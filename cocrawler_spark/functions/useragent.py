"""Crawler identity strings (cocrawler/useragent.py† analog)."""

from __future__ import annotations

ROBOTS_TOKEN = "cocrawler-spark"
VERSION = "0.1.0"


def user_agent(contact_url: str = "http://example.test/crawler") -> str:
    return f"Mozilla/5.0 (compatible; {ROBOTS_TOKEN}/{VERSION}; +{contact_url})"
