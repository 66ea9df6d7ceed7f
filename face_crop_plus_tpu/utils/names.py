"""OS-safe filename cleaning (pre-pass utility).

Equivalent functionality to reference ``src/face_crop_plus/utils.py:344-453``:
transliterate non-ASCII names, strip reserved characters, truncate to a path
budget and deduplicate case-insensitively with ``-N`` suffixes.  Uses
``unidecode`` when installed, otherwise falls back to a NFKD-based ASCII
transliteration.
"""

from __future__ import annotations

import collections
import os
import re
import shutil
import unicodedata

try:  # pragma: no cover - optional dependency
    import unidecode as _unidecode

    def _to_ascii(s: str) -> str:
        return _unidecode.unidecode(s)

except Exception:  # pragma: no cover

    def _to_ascii(s: str) -> str:
        out = unicodedata.normalize("NFKD", s)
        return out.encode("ascii", "ignore").decode("ascii")


DEFAULT_EXCLUDE = set("\00!@#$%^&*?={}:;'<>,.?/\\|" + '"')


def clean_names(
    input_dir: str,
    output_dir: str | None = None,
    max_chars: int = 250,
    exclude: set | None = None,
    desc: str | None = "Cleaning file names",
):
    """Renames (in place) or copies files in a directory to OS-safe names.

    Args:
        input_dir: Directory containing only files to process.
        output_dir: If given, cleaned copies are written here; otherwise
            files are renamed in place.
        max_chars: Maximum number of characters per file *path*.
        exclude: Characters to strip from the base name (not the extension).
        desc: Progress bar description; None disables the progress bar.

    Raises:
        RuntimeError: If the directory path leaves fewer than 6 characters
            of name budget.
    """
    if exclude is None:
        exclude = DEFAULT_EXCLUDE

    # Budget against the directory the files will actually land in.
    dest_dir = input_dir if output_dir is None else output_dir
    max_chars -= len(dest_dir)
    filename_counts = collections.defaultdict(int)  # base name -> last suffix
    taken: set[str] = set()  # names assigned this run (case-insensitive)

    if max_chars <= 5:
        raise RuntimeError(
            f"Directory path length is too long ({len(dest_dir)}) Either "
            f"reduce the length of the directory name or increase `max_chars`."
        )

    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)

    filenames = os.listdir(input_dir)
    # Names not yet processed (case-insensitive): an in-place rename must
    # never land on one of these — os.rename would silently replace the
    # other file's contents on POSIX.  A *multiset* of lowercased keys: two
    # case-differing files share a key, and the guard must hold until every
    # holder has been processed, not just the first.
    pending = collections.Counter(f.lower() for f in filenames)

    if desc is not None:
        try:
            import tqdm

            filenames = tqdm.tqdm(filenames, desc=desc)
        except Exception:  # pragma: no cover
            pass

    for filename in filenames:
        key = filename.lower()
        if pending[key] <= 1:
            del pending[key]
        else:
            pending[key] -= 1
        name, ext = os.path.splitext(filename)

        if not name.isascii():
            name = _to_ascii(name)

        bad = set(name) & exclude
        if bad:
            name = re.sub(f"[{re.escape(''.join(bad))}]", "", name)

        # Truncate the *cleaned* name: transliteration can lengthen it
        # (e.g. one CJK char → several ASCII chars).
        if len(name + ext) > max_chars:
            name = name[: max_chars - len(ext)]

        # Case-insensitive dedup: the first claimant keeps the plain name,
        # later ones get -1, -2, ... in encounter order.  A name is not
        # free when already assigned this run (``taken``) or, for in-place
        # renames, still held by a not-yet-processed file (``pending`` —
        # os.rename would silently replace its contents on POSIX).  A
        # pending holder does NOT cost itself a suffix later: only the
        # colliding file is suffixed (so 'ä.jpg' + 'a.jpg' yields
        # 'a-1.jpg' + 'a.jpg', stable across listdir orders).
        def _free(candidate: str) -> bool:
            k = (candidate + ext).lower()
            if k in taken:
                return False
            return not (output_dir is None and k in pending)

        if _free(name):
            pass
        else:
            i = filename_counts[(name + ext).lower()] + 1
            while not _free(f"{name}-{i}"):
                i += 1
            filename_counts[(name + ext).lower()] = i
            name = f"{name}-{i}"
        taken.add((name + ext).lower())

        if output_dir is not None:
            shutil.copy(
                os.path.join(input_dir, filename),
                os.path.join(output_dir, name + ext),
            )
        elif name + ext != filename:
            os.rename(
                os.path.join(input_dir, filename),
                os.path.join(input_dir, name + ext),
            )
