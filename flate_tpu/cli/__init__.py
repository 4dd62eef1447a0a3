"""Command-line tools mirroring the reference's bin/ set (SURVEY §2.2)."""
