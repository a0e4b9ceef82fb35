from .segments import Segment
from .musicxml import export_musicxml
from .midi import write_midi_from_score, write_midi_from_note_events, export_chords_midi
from .csvout import save_note_events_csv

__all__ = [
    "Segment",
    "export_musicxml",
    "write_midi_from_score",
    "write_midi_from_note_events",
    "export_chords_midi",
    "save_note_events_csv",
]
