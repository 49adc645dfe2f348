"""Token <-> id vocabulary encoder.

Mirrors the reference's ``TokenTextEncoder`` contract
(``utils/text_encoder.py:157-230``): ids 0/1/2 are reserved for
``<pad>/<EOS>/<UNK>``, vocab entries follow, and out-of-vocabulary tokens are
replaced by a configurable token (the SVS pipeline uses ``SP``/``,``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

PAD = "<pad>"
EOS = "<EOS>"
UNK = "<UNK>"
RESERVED_TOKENS = [PAD, EOS, UNK]
PAD_ID = 0
EOS_ID = 1
UNK_ID = 2


class TokenTextEncoder:
    """Encode/decode between token strings and integer ids."""

    def __init__(
        self,
        vocab_list: Sequence[str],
        replace_oov: Optional[str] = None,
        num_reserved_ids: int = len(RESERVED_TOKENS),
    ):
        self._num_reserved_ids = num_reserved_ids
        self._replace_oov = replace_oov
        self._id_to_token = list(RESERVED_TOKENS[:num_reserved_ids]) + list(vocab_list)
        self._token_to_id = {t: i for i, t in enumerate(self._id_to_token)}

    @property
    def vocab_size(self) -> int:
        return len(self._id_to_token)

    def __len__(self) -> int:
        return self.vocab_size

    def contains(self, token: str) -> bool:
        return token in self._token_to_id

    def encode(self, s) -> List[int]:
        """Encode a space-separated string or token list into ids."""
        sentence = s.split(" ") if isinstance(s, str) else list(s)
        if self._replace_oov is not None:
            sentence = [
                t if t in self._token_to_id else self._replace_oov for t in sentence
            ]
        return [self._token_to_id[t] for t in sentence]

    def decode(self, ids: Sequence[int], strip_padding: bool = False) -> str:
        if strip_padding:
            ids = [i for i in ids if i != PAD_ID]
        return " ".join(self._id_to_token[i] for i in ids)

    def token(self, id_: int) -> str:
        return self._id_to_token[id_]

    def id(self, token: str) -> int:
        return self._token_to_id[token]

    def store_to_file(self, filename: str):
        with open(filename, "w", encoding="utf-8") as f:
            for tok in self._id_to_token[self._num_reserved_ids :]:
                f.write(tok + "\n")
