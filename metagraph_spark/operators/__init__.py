"""Graph algorithm operators (SURVEY.md §2.1) — each module documents the
reference semantics it implements (file:line into /root/reference)."""
