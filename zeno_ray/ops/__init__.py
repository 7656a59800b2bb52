"""Large-scale training-data operations over the documents/embeddings
tables — first-class components of the engine alongside the crawl operators
(driver brief): exact + near dedup, similarity search, text analysis,
multimodal plumbing, and general relational demos."""
