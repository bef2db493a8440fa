"""Engine operators beyond the reference surface: joins the reference
lacks, dedup family, similarity search (SURVEY.md §2.4 Part C / §2.5 C-X).
"""
