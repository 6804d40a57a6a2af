"""Tagged console logging (parity with /root/reference/utils/logging_utils.py)."""

from __future__ import annotations

try:
    from rich.console import Console

    _console = Console()

    def Log(*args, tag: str = "MonoGS-TPU") -> None:
        style = {"MonoGS-TPU": "bold green", "GUI": "bold magenta", "Eval": "bold red"}.get(
            tag, "bold blue"
        )
        _console.print(f"[{style}]{tag}:[/{style}]", *args)

except Exception:  # pragma: no cover - rich is expected to exist

    def Log(*args, tag: str = "MonoGS-TPU") -> None:
        print(f"{tag}:", *args)
