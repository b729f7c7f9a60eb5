// Per-page getAnnotations dump via the reference's vendored build.
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
  return d;
}

var data = new Uint8Array(fs.readFileSync(process.argv[2]));
PDFJS.getDocument(data).then(function (doc) {
  var pages = [];
  var chain = Promise.resolve();
  for (var i = 1; i <= doc.numPages; i++) {
    (function (pn) {
      chain = chain.then(function () {
        return doc.getPage(pn).then(function (page) {
          return page.getAnnotations().then(function (annots) {
            pages.push({
              page: pn,
              annots: annots.map(function (a) {
                return {
                  id: a.id,
                  subtype: a.subtype,
                  annotationType: a.annotationType === undefined ? null : a.annotationType,
                  rect: a.rect,
                  flags: a.annotationFlags === undefined ? null : a.annotationFlags,
                  hasAppearance: a.hasAppearance,
                  color: a.color ? Array.prototype.slice.call(a.color) : null,
                  url: a.url === undefined ? null : a.url,
                  dest: renderDest(a.dest === undefined ? null : a.dest),
                  action: a.action === undefined ? null : a.action
                };
              })
            });
          });
        });
      });
    })(i);
  }
  return chain.then(function () {
    console.log(JSON.stringify({ pages: pages }));
  });
}).then(null, function (err) { console.error('Error: ' + err); process.exit(1); });
