// Attachments + document-JavaScript dump via the reference's vendored build.
var fs = require('fs');
var crypto = require('crypto');
global.window = global;
global.navigator = { userAgent: 'node' };
global.PDFJS = {};
global.DOMParser = require('/root/reference/src/main/js/node/domparsermock.js').DOMParserMock;
require('/root/reference/src/main/js/node/domstubs.js');
PDFJS.workerSrc = true;
require('/root/reference/src/main/js/pdf.combined.js');

var data = new Uint8Array(fs.readFileSync(process.argv[2]));
PDFJS.getDocument(data).then(function (doc) {
  return doc.getAttachments().then(function (atts) {
    return doc.getJavaScript().then(function (js) {
      var out = {};
      if (atts) {
        for (var k in atts) {
          var a = atts[k];
          out[k] = {
            filename: a.filename,
            len: a.content ? a.content.length : null,
            md5: a.content ?
              crypto.createHash('md5').update(Buffer.from(a.content)).digest('hex') :
              null
          };
        }
      }
      console.log(JSON.stringify({ attachments: atts ? out : null, javaScript: js }));
    });
  });
}).then(null, function (err) { console.error('Error: ' + err); process.exit(1); });
