"""Training-data-pipeline operators over Datasets (dedup, similarity,
text analysis, multimodal plumbing)."""
