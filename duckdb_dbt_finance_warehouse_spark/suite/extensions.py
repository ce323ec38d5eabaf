"""Extension-surface suite (SURVEY §7.6): dedup, similarity search,
text analysis, multimodal plumbing, event sessionization.

Registered incrementally; see operators/ for the implementations.
"""

from __future__ import annotations
