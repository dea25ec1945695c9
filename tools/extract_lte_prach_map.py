#!/usr/bin/env python3
"""One-time extraction of TS 36.211 Table 5.7.2-4 (logical->physical PRACH
root sequence order) into data/lte_tables.py.

Pure 3GPP spec constant data (the table orders ZC roots by cubic metric and
pairs u with N_ZC-u; there is no closed-form generator).  Read from the
reference checkout's verbatim rendering in prach_common.c and appended as a
Python literal, like the QPP table."""
import re

src = open("/root/reference/openair1/PHY/LTE_TRANSPORT/prach_common.c").read()

def grab(name, n):
    m = re.search(re.escape(name) + r"\[\d+\] = \{(.*?)\};", src, re.S)
    vals = [int(t) for t in re.findall(r"\d+", m.group(1))]
    assert len(vals) == n, (name, len(vals))
    return vals

m03 = grab("prach_root_sequence_map0_3", 838)
m4 = grab("prach_root_sequence_map4", 138)
assert sorted(m03) == list(range(1, 839)) and sorted(m4) == list(range(1, 139))

def fmt(vals):
    lines, cur = [], "    "
    for v in vals:
        tok = f"{v}, "
        if len(cur) + len(tok) > 78:
            lines.append(cur.rstrip())
            cur = "    "
        cur += tok
    lines.append(cur.rstrip())
    return "\n".join(lines)

with open("openairinterface5g_tpu/data/lte_tables.py", "a") as f:
    f.write(f'''

# TS 36.211 Table 5.7.2-4: logical index -> physical ZC root u, preamble
# formats 0-3 (N_ZC=839).  Non-arithmetic spec ordering (by cubic metric,
# u paired with 839-u); extracted by tools/extract_lte_prach_map.py.
PRACH_ROOT_MAP_0_3 = (
{fmt(m03)}
)

# TS 36.211 Table 5.7.2-5: same for format 4 (N_ZC=139).
PRACH_ROOT_MAP_4 = (
{fmt(m4)}
)
''')
print("ok", len(m03), len(m4))
