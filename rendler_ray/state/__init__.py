"""Stateful components: URL-seen shards (exact/cuckoo), politeness."""
