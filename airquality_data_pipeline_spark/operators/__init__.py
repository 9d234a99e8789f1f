"""Reusable dataflow operators re-expressing the reference pipeline's
semantics (SURVEY.md §2) Spark-first, plus the LLM-data-pipeline operator
family (dedup / similarity / text / multimodal) the north star requires."""
