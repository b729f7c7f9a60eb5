// Document-outline + destinations dump via the reference's vendored build.
// Emits one JSON object: { outline: <getOutline() tree>, dests: {name: dest} }
// with refs rendered as "num_gen" strings so the dump is stable.
var fs = require('fs');
global.window = global;
global.navigator = { userAgent: 'node' };
global.PDFJS = {};
global.DOMParser = require('/root/reference/src/main/js/node/domparsermock.js').DOMParserMock;
require('/root/reference/src/main/js/node/domstubs.js');
PDFJS.workerSrc = true;
require('/root/reference/src/main/js/pdf.combined.js');

function renderDest(d) {
  if (d === null || d === undefined) return null;
  if (typeof d === 'string') return d;
  if (Array.isArray(d)) {
    return d.map(function (x) {
      if (x && typeof x === 'object' && 'num' in x && 'gen' in x) {
        return 'ref:' + x.num + '_' + x.gen;
      }
      if (x && typeof x === 'object' && x.name !== undefined) {
        return 'name:' + x.name;
      }
      return x;
    });
  }
  if (typeof d === 'object' && 'num' in d && 'gen' in d) {
    return 'ref:' + d.num + '_' + d.gen;
  }
  return d;
}
function renderItems(items) {
  return (items || []).map(function (it) {
    return {
      title: it.title,
      dest: renderDest(it.dest),
      url: it.url === undefined ? null : it.url,
      color: Array.prototype.slice.call(it.color || []),
      count: it.count === undefined ? null : it.count,
      bold: it.bold,
      italic: it.italic,
      items: renderItems(it.items)
    };
  });
}

var data = new Uint8Array(fs.readFileSync(process.argv[2]));
PDFJS.getDocument(data).then(function (doc) {
  return doc.getOutline().then(function (outline) {
    return doc.getDestinations().then(function (dests) {
      var out = {};
      var refs = {};
      var refList = [];
      for (var k in dests) {
        out[k] = renderDest(dests[k]);
        var d = dests[k];
        if (Array.isArray(d) && d[0] && typeof d[0] === 'object' &&
            'num' in d[0] && !(d[0].num + '_' + d[0].gen in refs)) {
          refs[d[0].num + '_' + d[0].gen] = null;
          refList.push(d[0]);
        }
      }
      var chain = Promise.resolve();
      refList.forEach(function (r) {
        chain = chain.then(function () {
          return doc.getPageIndex(r).then(function (idx) {
            refs[r.num + '_' + r.gen] = idx;
          }, function () { refs[r.num + '_' + r.gen] = null; });
        });
      });
      return chain.then(function () {
        console.log(JSON.stringify({
          outline: outline === null ? null : renderItems(outline),
          dests: out,
          refPages: refs
        }));
      });
    });
  });
}).then(null, function (err) { console.error('Error: ' + err); process.exit(1); });
