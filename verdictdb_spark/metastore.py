"""Sketch/scramble metastore — the SHOW SCRAMBLES surface.

Rebuild of the reference's metastore table ``verdictdbmeta``
(original_schema, original_table, scramble_schema, scramble_table,
added_at, data-json) (``metastore/ScrambleMetaStore.java:53-65``) as
a JSON-lines registry file next to the artifacts, with the same
contract: register on create, list for discovery, newest-wins lookup
(the reference orders by ADDED_AT, ``ScrambleMetaStore.java:184``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass


@dataclass
class ArtifactEntry:
    kind: str  # "scramble" | "sketch"
    source_table: str
    artifact_path: str
    meta_json: str
    added_at: float


class MetaStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "verdictdb_meta.jsonl")

    def register(self, kind: str, source_table: str, artifact_path: str, meta_json: str) -> None:
        entry = ArtifactEntry(kind, source_table, artifact_path, meta_json, time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(entry)) + "\n")

    def entries(self) -> list[ArtifactEntry]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                if line.strip():
                    out.append(ArtifactEntry(**json.loads(line)))
        return out

    def show(self, kind: str | None = None) -> list[ArtifactEntry]:
        """SHOW SCRAMBLES / SHOW SKETCHES."""
        return [e for e in self.entries() if kind is None or e.kind == kind]

    def lookup(self, source_table: str, kind: str | None = None) -> ArtifactEntry | None:
        """Newest artifact for a source table (reference: ORDER BY ADDED_AT)."""
        matches = [
            e for e in self.entries()
            if e.source_table == source_table and (kind is None or e.kind == kind)
        ]
        return max(matches, key=lambda e: e.added_at) if matches else None

    def drop(self, artifact_path: str) -> None:
        """DROP SCRAMBLE — remove the registry entry (not the data).

        Atomic rewrite (temp file + rename): a crash mid-write must
        never truncate the whole registry."""
        kept = [e for e in self.entries() if e.artifact_path != artifact_path]
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            for e in kept:
                f.write(json.dumps(asdict(e)) + "\n")
        os.replace(tmp, self.path)
