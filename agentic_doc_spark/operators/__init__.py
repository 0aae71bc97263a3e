"""Distributed operators: split/merge live in pipeline.py; this package
holds lineage/resume, schema-driven extraction, dedup, similarity, and
multimodal plumbing (SURVEY.md §2 + the training-data-pipeline additions).
"""
