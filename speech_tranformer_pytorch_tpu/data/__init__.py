from .features import apply_cmvn, extract_features, log_mel_spectrogram
from .tokenizer import (BpeTokenizer, CharTokenizer, load_tokenizer,
                        normalize_text)
from .prepare import (prepare_aishell, prepare_synthetic, read_audio,
                      read_manifest, write_manifest, write_wav)
from .pipeline import (AudioBatch, BucketedBatcher, ManifestDataset,
                       make_audio_train_step, make_preprocess_fn)
