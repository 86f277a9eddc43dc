"""Collection operators: the railgun DFL operator inventory (SURVEY §2)
re-expressed as Catalyst logical plans, plus the beyond-reference scale
operators (dedup, similarity, text analysis, multimodal)."""
