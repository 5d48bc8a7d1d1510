"""Custom operators the engine adds on top of built-in DataFrame ops.

All of these are *library-level* compositions of DataFrame primitives
(SURVEY.md §4: no custom Catalyst rules are needed) — each documents its
shuffle behavior and 100 TB scaling posture.
"""
