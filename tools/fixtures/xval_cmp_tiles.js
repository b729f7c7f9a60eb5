// Compare vendored harness output against ours for each /tmp/xvt_*.j2k —
// multi-tile variant: composites the vendored per-tile items (left/top
// origins) onto the full image grid before diffing.
const fs = require('fs');
const cp = require('child_process');
const files = fs.readdirSync('/tmp').filter(f => f.startsWith('xvt_') && f.endsWith('.j2k'));
let fail = 0;
for (const f of files.sort()) {
  const name = f.slice(4, -4);
  let ref;
  try {
    const out = cp.execSync(`node /tmp/jpx_harness.js /tmp/${f}`, {maxBuffer: 1 << 26}).toString();
    ref = JSON.parse(out);
  } catch (e) { console.log(`${name}: vendored decoder ERROR: ${e.message.split('\n')[0]}`); fail++; continue; }
  const ours = JSON.parse(fs.readFileSync(`/tmp/xvt_${name}.ours.json`));
  const comps = ours.comps;
  if (ref.comps !== comps) { console.log(`${name}: comps ${ref.comps} vs ${comps}`); fail++; continue; }
  const full = new Array(ours.w * ours.h * comps).fill(-1);
  for (const t of ref.tiles) {
    for (let y = 0; y < t.height; y++)
      for (let x = 0; x < t.width; x++)
        for (let c = 0; c < comps; c++)
          full[(((t.top + y) * ours.w) + (t.left + x)) * comps + c] =
            t.items[(y * t.width + x) * comps + c];
  }
  if (full.length !== ours.items.length) { console.log(`${name}: length`); fail++; continue; }
  let mism = 0, firstIdx = -1;
  for (let i = 0; i < full.length; i++) if (full[i] !== ours.items[i]) { if (firstIdx < 0) firstIdx = i; mism++; }
  console.log(`${name}: ${mism} mismatched samples of ${full.length}` + (mism ? ` (first at ${firstIdx}: ref=${full[firstIdx]} ours=${ours.items[firstIdx]})` : ''));
  if (mism) fail++;
}
process.exit(fail ? 1 : 0);
