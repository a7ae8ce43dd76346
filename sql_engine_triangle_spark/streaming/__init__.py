"""Structured Streaming surface (SURVEY.md §2.9: north-star
extension — the reference's user_events table is stream-shaped but
only ever batch-queried; here both surfaces share one logical plan).
"""
