"""Batch stages: fetch (web-shard lookup), link extraction, render."""
