"""Composable DataFrame operators — the pygr-capability layer plus
LLM-pipeline operators (SURVEY.md §2, BASELINE.json north star)."""
