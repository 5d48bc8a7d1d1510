"""Structured Streaming surface (SURVEY.md §2.9): the reference's 2-minute
scheduled micro-batch rebuilt on real streaming triggers, plus watermarks,
windows, sessionization, and stateful ops over the events stream."""
