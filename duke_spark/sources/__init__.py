"""Schema-first sources: transcripts (primary input) + testdata tables."""
