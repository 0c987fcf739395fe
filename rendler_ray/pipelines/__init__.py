"""Pipelines: the crawl round loop, dot export, queries registry."""
