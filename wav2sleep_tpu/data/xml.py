"""NSRR XML sleep-stage annotation parsing.

Equivalent of reference src/wav2sleep/data/xml.py:12-60: scored stage events
are extracted, expanded into 30 s epochs, and timestamps shifted +30 s so a
label describes the *preceding* 30 s of signal.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..settings import LABEL, TIMESTAMP
from .utils import convert_int_stage

_STAGE_EVENT_RE = re.compile(
    r'<EventType>Stages.Stages</EventType>\n'
    r'<EventConcept>(?P<concept>.+)</EventConcept>\n'
    r'<Start>(?P<start>.+)</Start>\n'
    r'<Duration>(?P<duration>.+)</Duration>\n'
    r'</ScoredEvent>'
)
_START_RE = re.compile(r'<EventConcept>Recording Start Time</EventConcept>\n<Start>0</Start>')


def parse_xml_annotations(filepath: str) -> pd.Series:
    """Parse an NSRR annotations XML into a seconds-indexed stage series."""
    with open(filepath) as f:
        content = f.read()
    n_starts = len(_START_RE.findall(content))
    if n_starts == 0:
        raise ValueError(f'{filepath=} had no start time.')
    if n_starts > 1:
        raise ValueError(f'{filepath=} had multiple start times.')
    events = list(_STAGE_EVENT_RE.finditer(content))
    return create_sleep_series(events)


def create_sleep_series(events) -> pd.Series:
    """Expand stage events (concept, start, duration) into a 30 s epoch series."""
    stages: list[float] = []
    for ind, m in enumerate(events):
        concept = m.group('concept')
        # NSRR stage concepts end '...|<digit>'; the digit is the stage code.
        stage = convert_int_stage(concept.rsplit('|', 1)[-1])
        start = float(m.group('start'))
        if ind == 0 and start != 0.0:
            raise ValueError(f'First stage did not start at 0.0s: {start}')
        duration = float(m.group('duration'))
        if duration % 30 != 0.0:
            raise ValueError(f'Non-30s epoch duration: {duration}')
        stages += [stage] * (int(duration) // 30)
    ts = np.arange(0, 30 * len(stages), 30.0) + 30  # Label = preceding 30 s.
    return (
        pd.DataFrame({LABEL: stages, TIMESTAMP: ts}).set_index(TIMESTAMP).squeeze(axis='columns').sort_index()
    )
