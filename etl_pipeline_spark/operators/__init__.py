"""Custom operators beyond the stock DataFrame surface: SimHash dedup,
multimodal binary-column plumbing, block-matrix similarity."""
