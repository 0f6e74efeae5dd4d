"""Engine operators: routing, keys-model collapse, compaction, and the
LLM-data-pipeline extension surface (dedup / similarity / text /
multimodal)."""
