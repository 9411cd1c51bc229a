"""Every `benchmarks/<name>.json` cited in docs, docstrings or comments
must exist — claims in prose must point at real measured artifacts
(round-4 verdict: two cited studies had no committed record)."""
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# benchmarks/foo.json or a bare foo.json mentioned as "(study: foo.json)"
_CITE = re.compile(r'benchmarks/([\w.\-]+\.json)')


def _cited(paths):
    hits = {}
    for p in paths:
        try:
            text = p.read_text()
        except UnicodeDecodeError:
            continue
        for m in _CITE.finditer(text):
            hits.setdefault(m.group(1), set()).add(
                str(p.relative_to(REPO)))
    return hits


@pytest.mark.smoke
def test_cited_benchmark_artifacts_exist():
    sources = [REPO / 'benchmarks' / 'RESULTS.md', REPO / 'bench.py',
               REPO / 'README.md', REPO / 'COMPONENTS.md']
    sources += sorted((REPO / 'diffco_tpu').rglob('*.py'))
    sources += sorted((REPO / 'scripts').glob('*.py'))
    cited = _cited([p for p in sources if p.exists()])
    assert cited, 'citation regex matched nothing — pattern drift?'
    bench_dir = REPO / 'benchmarks'
    missing = {name: sorted(srcs) for name, srcs in sorted(cited.items())
               if not (bench_dir / name).exists()
               # scripts legitimately NAME their own --out default before
               # the artifact exists; only prose/library citations are
               # claims about measured results
               and any(not s.startswith('scripts/') for s in srcs)}
    assert not missing, (
        f'cited benchmark artifacts do not exist: {missing} — either run '
        f'the study that produces them or drop the citation')
