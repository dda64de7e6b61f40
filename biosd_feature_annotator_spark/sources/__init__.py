from .lexicon import Lexicon, load_lexicon, lexicon_df  # noqa: F401
from .transcripts import read_transcripts, write_transcripts  # noqa: F401
