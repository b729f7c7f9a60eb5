// Item dump with getTextContent({normalizeWhitespace}) — argv[3] = 0|1, argv[4] = page
var fs = require('fs');
global.window = global;
global.navigator = { userAgent: 'node' };
global.PDFJS = {};
global.DOMParser = require('/root/reference/src/main/js/node/domparsermock.js').DOMParserMock;
require('/root/reference/src/main/js/node/domstubs.js');
PDFJS.workerSrc = true;
require('/root/reference/src/main/js/pdf.combined.js');
var data = new Uint8Array(fs.readFileSync(process.argv[2]));
var nw = process.argv[3] === '1';
var pageNum = parseInt(process.argv[4] || '1', 10);
PDFJS.getDocument(data).then(function (doc) {
  return doc.getPage(pageNum).then(function (page) {
    return page.getTextContent({ normalizeWhitespace: nw }).then(function (content) {
      console.log(JSON.stringify(content.items.map(function (i) {
        return { str: i.str, dir: i.dir };
      })));
    });
  });
}).then(null, function (err) { console.error('Error: ' + err); process.exit(1); });
