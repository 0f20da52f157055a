"""pdf_context_extractor_agent_ray — a Ray-Data-native extraction engine.

A from-scratch reimplementation of the query/data-processing
capabilities of cuiqinsain-cloud/pdf_context_extractor_agent as a streaming
``ray.data.Dataset`` pipeline over tables of interleaved text+media
documents (``doc_id, spans:list<struct<kind,text,media_ref,offset>>``),
plus the generic large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) the engine exposes as
first-class functions.
"""
__version__ = "0.1.0"
