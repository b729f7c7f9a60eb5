var fs = require('fs');
global.window = global;
global.navigator = { userAgent: 'node' };
global.PDFJS = {};
global.DOMParser = require('/root/reference/src/main/js/node/domparsermock.js').DOMParserMock;
require('/root/reference/src/main/js/node/domstubs.js');
PDFJS.workerSrc = true;
require('/root/reference/src/main/js/pdf.combined.js');
var data = new Uint8Array(fs.readFileSync(process.argv[2]));
PDFJS.getDocument(data).then(function (doc) {
  console.log(JSON.stringify({ fingerprint: doc.fingerprint }));
}).then(null, function (err) { console.error('Error: ' + err); process.exit(1); });
